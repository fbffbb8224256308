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


def test_toctree_entries_exist():
    """Every toctree entry in index.rst points at an existing source file
    (sphinx is not installed in the test image; this catches the same class
    of breakage the docs CI job would)."""
    root = pathlib.Path(__file__).resolve().parents[1] / "docs" / "source"
    text = (root / "index.rst").read_text()
    entries = re.findall(r"^   ([\w/]+)$", text, re.M)
    assert entries, "no toctree entries found"
    for entry in entries:
        candidates = [root / f"{entry}{ext}" for ext in (".rst", ".md")]
        assert any(c.exists() for c in candidates), f"missing doc page {entry}"


def test_guide_code_fences_are_balanced():
    """Narrative guides keep well-formed fenced code blocks."""
    root = pathlib.Path(__file__).resolve().parents[1] / "docs" / "source"
    for md in root.glob("*.md"):
        fences = md.read_text().count("```")
        assert fences % 2 == 0, f"unbalanced code fences in {md.name}"


def test_api_diff_clean():
    """The reference's public surface is fully covered (tools/api_diff.py):
    zero missing symbols, every delta justified inline."""
    import pytest

    if not pathlib.Path("/root/reference/src/temfpy").exists():
        pytest.skip("reference checkout not present")
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
    try:
        import api_diff
    finally:
        sys.path.pop(0)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = api_diff.main()
    assert rc == 0, buf.getvalue()
