"""scripts/release.py version plumbing (parity role of the reference's
version-tag.py sanity checks)."""

import os
import sys

import pytest


def _rel():
    sys.path.insert(0, ".")
    from scripts import release

    return release


def test_bump_parts():
    r = _rel()
    assert r.bump_version("0.1.0", "patch") == "0.1.1"
    assert r.bump_version("0.1.9", "minor") == "0.2.0"
    assert r.bump_version("1.9.9", "major") == "2.0.0"
    with pytest.raises(ValueError):
        r.bump_version("0.1", "patch")
    with pytest.raises(ValueError):
        r.bump_version("0.1.0", "nano")


def test_read_write_roundtrip(tmp_path):
    r = _rel()
    pkg = tmp_path / "nums_tpu"
    pkg.mkdir()
    (pkg / "_version.py").write_text('__version__ = "0.1.0"\n')
    (tmp_path / "pyproject.toml").write_text(
        '[project]\nname = "nums-tpu"\nversion = "0.1.0"\n'
    )
    assert r.read_versions(str(tmp_path)) == ("0.1.0", "0.1.0")
    r.write_versions("0.2.0", root=str(tmp_path))
    assert r.read_versions(str(tmp_path)) == ("0.2.0", "0.2.0")
    # the rest of each file is untouched
    assert 'name = "nums-tpu"' in (tmp_path / "pyproject.toml").read_text()


def test_repo_versions_agree():
    """The committed sources must never skew (release.py check gates
    this at release time; this keeps it true between releases)."""
    r = _rel()
    repo = os.path.join(os.path.dirname(__file__), "..")
    pkg, toml = r.read_versions(repo)
    assert pkg == toml
