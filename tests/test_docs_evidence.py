"""Docs-evidence lint (VERDICT r4 #4): every ``experiments/<name>.out``
(or ``.json``) a doc cites must exist in the tree — a perf claim whose
record is gone is a TODO, not a result. Lost round-3/4 records are
struck to ``docs/ERRATA.md`` instead of cited by path.
"""

import os
import re
import subprocess

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_CITE = re.compile(r"experiments/[A-Za-z0-9_.-]+\.(?:out|json)")


def _doc_files():
    docs = []
    for base in ("docs", "."):
        d = os.path.join(_ROOT, base)
        for f in os.listdir(d):
            if f.endswith(".md"):
                docs.append(os.path.join(d, f))
        if base == ".":
            break
    return docs


def test_cited_experiment_records_exist():
    missing = {}
    for doc in _doc_files():
        with open(doc) as fh:
            text = fh.read()
        for cite in set(_CITE.findall(text)):
            if not os.path.exists(os.path.join(_ROOT, cite)):
                missing.setdefault(cite, []).append(os.path.basename(doc))
    assert not missing, (
        f"docs cite experiment records not in the tree: {missing} — "
        "regenerate the record (git add -f) or strike the citation to "
        "docs/ERRATA.md"
    )


def test_cited_experiment_records_tracked():
    """Existing on disk is not enough — untracked records are one
    ``git clean`` from vanishing (that is how rounds 3-4 lost 22 of
    them)."""
    try:
        tracked = set(subprocess.run(
            ["git", "ls-files", "experiments/"], cwd=_ROOT,
            capture_output=True, text=True, timeout=30,
        ).stdout.split())
    except Exception:
        pytest.skip("git unavailable")
    if not tracked:
        pytest.skip("not a git checkout")
    missing = {}
    for doc in _doc_files():
        with open(doc) as fh:
            text = fh.read()
        for cite in set(_CITE.findall(text)):
            if (os.path.exists(os.path.join(_ROOT, cite))
                    and cite not in tracked):
                missing.setdefault(cite, []).append(os.path.basename(doc))
    assert not missing, (
        f"docs cite records that exist but are NOT git-tracked: {missing} "
        "— git add -f them"
    )
