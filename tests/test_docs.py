"""Docs consistency: every autodoc target in docs/source imports, so the
Sphinx CI job (tests.yaml: docs) cannot fail on a stale module path."""

import importlib
import pathlib
import re


def test_automodule_targets_import():
    root = pathlib.Path(__file__).resolve().parents[1] / "docs" / "source"
    targets = []
    for rst in root.rglob("*.rst"):
        targets += re.findall(r"^\.\. automodule:: (\S+)", rst.read_text(), re.M)
    assert targets, "no autodoc targets found"
    for name in targets:
        importlib.import_module(name)
