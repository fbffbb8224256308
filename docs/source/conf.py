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
]

try:  # MyST is optional (markdown sources)
    import myst_parser  # noqa: F401

    extensions.append("myst_parser")
except ImportError:
    pass

autodoc_member_order = "bysource"
autodoc_typehints = "description"

try:
    import furo  # noqa: F401

    html_theme = "furo"
except ImportError:
    html_theme = "alabaster"

# library imports must not require a device at doc-build time
autodoc_mock_imports = []
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
exclude_patterns = []

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
