"""Sphinx configuration for TeMFpy-TPU (mirrors the reference's docs
pipeline: autodoc + MyST, built by CI)."""

project = "TeMFpy-TPU"
author = "TeMFpy-TPU developers"
copyright = "2026, TeMFpy-TPU developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.mathjax",
    "sphinx.ext.viewcode",
    "myst_parser",
]

autodoc_member_order = "bysource"
autodoc_typehints = "description"

html_theme = "furo"
exclude_patterns = []

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
