"""The CI tooling added in round 4: the sys.monitoring line-coverage
gate (reference parity: `coverage run -m pytest` + codecov floor,
.travis.yml/codecov.yml there) and the result-CSV figure renderer
(reference parity: scripts/plot_all.py there)."""

import importlib
import os
import sys
import textwrap

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts import linecov  # noqa: E402


def test_executable_lines_matches_interpreter(tmp_path):
    mod = tmp_path / "m.py"
    mod.write_text(textwrap.dedent("""
        def f(x):
            if x > 0:
                return 1
            return 2

        CONST = 3
    """))
    ex = linecov.executable_lines(str(mod))
    assert {2, 3, 4, 5, 7} <= ex  # def, if, both returns, assignment
    # A syntactically-broken file contributes nothing, not a crash.
    bad = tmp_path / "bad.py"
    bad.write_text("def broken(:\n")
    assert linecov.executable_lines(str(bad)) == set()


def test_monitoring_records_executed_lines_only(tmp_path):
    if sys.monitoring.get_tool(linecov.TOOL) is not None:
        pytest.skip("coverage tool id busy (suite running under linecov)")
    pkg = tmp_path / "covpkg"
    pkg.mkdir()
    (pkg / "mod.py").write_text(textwrap.dedent("""
        def taken(x):
            return x + 1

        def never(x):
            return x - 1
    """))
    sys.path.insert(0, str(tmp_path))
    linecov._covered.clear()
    linecov.start([str(pkg)])
    try:
        m = importlib.import_module("covpkg.mod")
        importlib.reload(m)  # fresh code objects under monitoring
        assert m.taken(1) == 2
    finally:
        linecov.stop()
        sys.path.remove(str(tmp_path))
    rows = linecov.summarize([str(pkg)], linecov._covered)
    by_name = {os.path.basename(r[0]): r for r in rows}
    _, n_exec, n_hit = by_name["mod.py"]
    assert 0 < n_hit < n_exec  # `never`'s body is the uncovered residue
    pct = linecov.report(rows, show_worst=3)
    assert 0 < pct < 100


def test_plot_all_renders_committed_artifacts(tmp_path, monkeypatch):
    from scripts import plot_all

    repo = os.path.join(os.path.dirname(__file__), "..")
    monkeypatch.chdir(repo)
    out = tmp_path / "plots"
    assert plot_all.main(["--out", str(out)]) == 0
    made = sorted(os.listdir(out))
    assert made == ["bop.png", "gemm.png", "lr.png", "ooc.png",
                    "tsqr.png"]
    for f in made:
        assert (out / f).stat().st_size > 10_000  # a real figure
