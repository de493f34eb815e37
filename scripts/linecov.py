#!/usr/bin/env python
"""Line coverage for ``nums_tpu`` via ``sys.monitoring`` (PEP 669).

The reference CI measures test line coverage (`coverage run -m pytest`,
codecov target 90% — ``/root/reference/.travis.yml`` +
``codecov.yml``); this image ships neither coverage.py nor pytest-cov,
so this is the stdlib equivalent: Python 3.12's low-overhead monitoring
API with per-location DISABLE after first hit (the same mechanism
coverage.py 7.4+ uses), so a line costs one callback ever.

Usage (what ``scripts/ci_gate.sh`` runs):

    python scripts/linecov.py --floor 80 tests/ -q

runs pytest in-process under monitoring, prints per-file and total
coverage, and exits non-zero if the suite fails OR total coverage is
below the floor.

Methodology notes:
  * "Executable lines" are exactly the interpreter's view: every line
    in the compiled code objects' ``co_lines()`` tables (recursively
    through nested code consts). No docstring/pragma exclusion — the
    number is slightly conservative vs coverage.py.
  * Child interpreters are traced too: ``scripts/linecov_boot`` is
    prepended to ``PYTHONPATH`` so every subprocess the suite spawns
    (``jax.distributed`` multi-host workers, dryrun device-count
    children, trackers) installs the same first-hit collector at
    startup and dumps its hits to ``NUMS_TPU_LINECOV_DIR`` at exit;
    the dumps are merged before reporting. Workers that are SIGKILLed
    (timeout cleanup) lose their dump — best-effort by design.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

TOOL = sys.monitoring.COVERAGE_ID

_covered = {}  # filename -> set of line numbers
_prefixes = ()


def _on_line(code, line):
    fn = code.co_filename
    for p in _prefixes:
        if fn.startswith(p):
            _covered.setdefault(fn, set()).add(line)
            break
    return sys.monitoring.DISABLE


def start(package_dirs):
    """Begin recording LINE events for files under ``package_dirs``."""
    global _prefixes
    pref = []
    for d in package_dirs:
        pref.append(os.path.abspath(d) + os.sep)
        pref.append(d.rstrip(os.sep) + os.sep)  # relative co_filename
    _prefixes = tuple(dict.fromkeys(pref))
    sys.monitoring.use_tool_id(TOOL, "linecov")
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.LINE, _on_line
    )
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)


def stop():
    sys.monitoring.set_events(TOOL, 0)
    sys.monitoring.register_callback(TOOL, sys.monitoring.events.LINE, None)
    sys.monitoring.free_tool_id(TOOL)


def executable_lines(path):
    """The interpreter's executable-line set for one source file."""
    with open(path, "rb") as f:
        src = f.read()
    lines = set()
    try:
        code = compile(src, path, "exec")
    except SyntaxError:
        return lines
    stack = [code]
    codetype = type(code)
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for c in co.co_consts:
            if isinstance(c, codetype):
                stack.append(c)
    return lines


def enable_subprocess_collection(package_dirs):
    """Point child interpreters at the linecov_boot sitecustomize.

    Returns the directory the children will dump their hit sets into.
    Mutates ``os.environ`` (inherited by everything the suite spawns;
    the multi-host tests strip only ``JAX_``/``XLA_`` prefixes).
    """
    sub_dir = tempfile.mkdtemp(prefix="linecov_sub_")
    boot = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "linecov_boot"
    )
    os.environ["NUMS_TPU_LINECOV_DIR"] = sub_dir
    os.environ["NUMS_TPU_LINECOV_PKGS"] = os.pathsep.join(
        os.path.abspath(p) for p in package_dirs
    )
    prev = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = boot + (os.pathsep + prev if prev else "")
    return sub_dir


def merge_subprocess(sub_dir, covered):
    """Fold child-interpreter hit dumps into ``covered``; returns count."""
    n = 0
    for f in sorted(os.listdir(sub_dir)):
        if not f.endswith(".json"):
            continue
        try:
            with open(os.path.join(sub_dir, f)) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue  # truncated dump from a dying worker
        for fn, lines in data.items():
            covered.setdefault(fn, set()).update(lines)
        n += 1
    return n


def summarize(package_dirs, covered):
    """[(relpath, n_exec, n_hit)] for every .py under the packages."""
    # Normalize covered keys to abspath for the join.
    cov = {}
    for fn, lines in covered.items():
        cov.setdefault(os.path.abspath(fn), set()).update(lines)
    rows = []
    for d in package_dirs:
        for root, _, files in os.walk(d):
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                path = os.path.join(root, f)
                ex = executable_lines(path)
                if not ex:
                    continue
                hit = cov.get(os.path.abspath(path), set()) & ex
                rows.append((os.path.relpath(path), len(ex), len(hit)))
    return rows


def uncovered_ranges(path, covered):
    """Sorted [(lo, hi)] of executable-but-unhit line ranges in path."""
    ex = executable_lines(path)
    hit = covered.get(os.path.abspath(path), set())
    missing = sorted(ex - hit)
    ranges = []
    for ln in missing:
        if ranges and ln == ranges[-1][1] + 1:
            ranges[-1][1] = ln
        else:
            ranges.append([ln, ln])
    return [(a, b) for a, b in ranges]


def report(rows, show_worst=15):
    total_ex = sum(r[1] for r in rows)
    total_hit = sum(r[2] for r in rows)
    pct = 100.0 * total_hit / max(1, total_ex)
    worst = sorted(rows, key=lambda r: r[2] / r[1])[:show_worst]
    print("\n== line coverage (sys.monitoring) ==")
    for rel, ex, hit in worst:
        print(f"  {100.0 * hit / ex:5.1f}%  {hit:>5}/{ex:<5}  {rel}")
    print(f"TOTAL line coverage: {pct:.1f}% "
          f"({total_hit}/{total_ex} lines, {len(rows)} files)")
    return pct


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--floor", type=float, default=None,
                    help="fail if total %% is below this")
    ap.add_argument("--pkg", action="append", default=None,
                    help="package dir(s) to measure (default: nums_tpu)")
    ap.add_argument("--worst", type=int, default=15,
                    help="how many worst-covered files to list")
    ap.add_argument("--uncovered", default=None,
                    help="print unhit line ranges for files whose path "
                         "contains this substring")
    args, pytest_args = ap.parse_known_args(argv)
    pkgs = args.pkg or ["nums_tpu"]

    # `python -m pytest` puts the cwd on sys.path (tests import
    # `tests.core...` helpers); running via this script must match.
    if os.getcwd() not in sys.path:
        sys.path.insert(0, os.getcwd())
    sub_dir = enable_subprocess_collection(pkgs)
    start(pkgs)
    import pytest

    rc = pytest.main(pytest_args or ["tests/", "-q"])
    stop()

    n_sub = merge_subprocess(sub_dir, _covered)
    print(f"merged {n_sub} subprocess coverage dump(s) from {sub_dir}")
    shutil.rmtree(sub_dir, ignore_errors=True)
    rows = summarize(pkgs, _covered)
    pct = report(rows, show_worst=args.worst)
    if args.uncovered:
        cov = {}
        for fn, lines in _covered.items():
            cov.setdefault(os.path.abspath(fn), set()).update(lines)
        for rel, _, _ in rows:
            if args.uncovered in rel:
                rngs = uncovered_ranges(rel, cov)
                spans = ", ".join(
                    f"{a}" if a == b else f"{a}-{b}" for a, b in rngs
                )
                print(f"uncovered {rel}: {spans or '(none)'}")
    if rc != 0:
        return int(rc)
    if args.floor is not None and pct < args.floor:
        print(f"FAIL: line coverage {pct:.1f}% < floor {args.floor}%")
        return 1
    if args.floor is not None:
        print(f"ok: line coverage {pct:.1f}% >= floor {args.floor}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
