"""Versioned-release tooling (parity: the reference's ``version-tag.py``
and ``version-release.py`` — tag sanity checks against ``git tag`` and a
build step keyed off the package version; the conda/twine publish legs
are replaced by an offline sdist/wheel build plus printed publish
commands, since this environment has no package-index egress).

The version lives in TWO files (``nums_tpu/_version.py`` and
``pyproject.toml``); every subcommand first verifies they agree.

Usage:
    python scripts/release.py check            # versions agree, tree
                                               # clean, tag absent
    python scripts/release.py bump --part patch|minor|major
    python scripts/release.py tag              # annotated v<version>
    python scripts/release.py build            # sdist+wheel into dist/
"""

import argparse
import os
import re
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_VERSION_PY = os.path.join(_ROOT, "nums_tpu", "_version.py")
_PYPROJECT = os.path.join(_ROOT, "pyproject.toml")

_PY_RE = re.compile(r'__version__\s*=\s*"([^"]+)"')
_TOML_RE = re.compile(r'^version\s*=\s*"([^"]+)"', re.MULTILINE)


def read_versions(root=None):
    """(package __version__, pyproject version)."""
    vp = _VERSION_PY if root is None else os.path.join(
        root, "nums_tpu", "_version.py")
    pp = _PYPROJECT if root is None else os.path.join(root, "pyproject.toml")
    with open(vp) as f:
        m = _PY_RE.search(f.read())
    with open(pp) as f:
        t = _TOML_RE.search(f.read())
    if m is None or t is None:
        raise SystemExit("version pattern not found in sources")
    return m.group(1), t.group(1)


def bump_version(version, part):
    """'1.2.3' + part -> the next version string; resets lower parts."""
    m = re.fullmatch(r"(\d+)\.(\d+)\.(\d+)", version)
    if m is None:
        raise ValueError(f"not a MAJOR.MINOR.PATCH version: {version!r}")
    major, minor, patch = map(int, m.groups())
    if part == "major":
        return f"{major + 1}.0.0"
    if part == "minor":
        return f"{major}.{minor + 1}.0"
    if part == "patch":
        return f"{major}.{minor}.{patch + 1}"
    raise ValueError(f"unknown part {part!r}")


def write_versions(new, root=None):
    vp = _VERSION_PY if root is None else os.path.join(
        root, "nums_tpu", "_version.py")
    pp = _PYPROJECT if root is None else os.path.join(root, "pyproject.toml")
    for path, rx, repl in (
        (vp, _PY_RE, f'__version__ = "{new}"'),
        (pp, _TOML_RE, f'version = "{new}"'),
    ):
        with open(path) as f:
            src = f.read()
        src, n = rx.subn(repl, src, count=1)
        if n != 1:
            raise SystemExit(f"could not rewrite version in {path}")
        with open(path, "w") as f:
            f.write(src)


def _git(*args):
    out = subprocess.run(["git", *args], cwd=_ROOT, capture_output=True,
                         text=True)
    if out.returncode != 0:
        raise SystemExit(f"git {' '.join(args)}: {out.stderr.strip()}")
    return out.stdout


def check(require_clean=True):
    pkg, toml = read_versions()
    if pkg != toml:
        raise SystemExit(
            f"version skew: nums_tpu/_version.py={pkg} pyproject={toml}"
        )
    tags = _git("tag").split()
    tag = f"v{pkg}"
    if tag in tags:
        raise SystemExit(f"{tag} is already tagged — bump first "
                         f"(existing: {', '.join(tags) or 'none'})")
    if require_clean and _git("status", "--porcelain").strip():
        raise SystemExit("working tree is dirty — commit before releasing")
    print(f"ok: version {pkg} consistent, untagged, tree clean")
    return pkg


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    sub.add_parser("check")
    b = sub.add_parser("bump")
    b.add_argument("--part", choices=("major", "minor", "patch"),
                   default="patch")
    sub.add_parser("tag")
    sub.add_parser("build")
    args = ap.parse_args(argv)

    if args.cmd in (None, "check"):
        check()
        return 0
    if args.cmd == "bump":
        cur, _ = read_versions()
        new = bump_version(cur, args.part)
        write_versions(new)
        print(f"bumped {cur} -> {new} (commit, then `release.py tag`)")
        return 0
    if args.cmd == "tag":
        version = check()
        _git("tag", "-a", f"v{version}", "-m", f"nums_tpu {version}")
        print(f"tagged v{version}")
        return 0
    if args.cmd == "build":
        version = check(require_clean=False)
        r = subprocess.run(
            [sys.executable, "setup.py", "sdist", "bdist_wheel"]
            if os.path.exists(os.path.join(_ROOT, "setup.py")) else
            [sys.executable, "-m", "build", "--no-isolation"],
            cwd=_ROOT,
        )
        if r.returncode != 0:
            return r.returncode
        print(f"built {version} into dist/ — publish with: "
              f"twine upload dist/*{version}*")
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
