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


def test_subprocess_collection_roundtrip(tmp_path):
    """A child interpreter under linecov_boot dumps hits that merge.

    The child imports a tiny package and runs one of two functions;
    the dump must carry exactly the taken lines, chain-load the real
    environment sitecustomize (jax backends still resolvable), and
    merge into a fresh covered dict.
    """
    import subprocess

    pkg = tmp_path / "subcovpkg"
    pkg.mkdir()
    (pkg / "mod.py").write_text(textwrap.dedent("""
        def taken(x):
            return x * 2

        def never(x):
            return x - 1
    """))
    script = tmp_path / "child.py"
    script.write_text(textwrap.dedent(f"""
        import sys
        sys.path.insert(0, {str(tmp_path)!r})
        from subcovpkg import mod
        assert mod.taken(3) == 6
        print("CHILD_OK")
    """))
    sub_dir = tmp_path / "dumps"
    sub_dir.mkdir()
    boot = os.path.join(
        os.path.dirname(os.path.abspath(linecov.__file__)), "linecov_boot"
    )
    env = dict(os.environ)
    env["NUMS_TPU_LINECOV_DIR"] = str(sub_dir)
    env["NUMS_TPU_LINECOV_PKGS"] = str(pkg)
    prev = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = boot + (os.pathsep + prev if prev else "")
    out = subprocess.run(
        [sys.executable, str(script)],
        capture_output=True, text=True, timeout=120, env=env,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "CHILD_OK" in out.stdout

    covered = {}
    n = linecov.merge_subprocess(str(sub_dir), covered)
    assert n == 1, sorted(os.listdir(sub_dir))
    hits = {
        ln
        for fn, lines in covered.items()
        if fn.endswith("mod.py")
        for ln in lines
    }
    assert 3 in hits  # taken's body executed
    assert 6 not in hits  # never's body did not
    # A truncated dump from a dying worker is skipped, not fatal.
    (sub_dir / "cov_bad.json").write_text("{truncated")
    covered2 = {}
    assert linecov.merge_subprocess(str(sub_dir), covered2) == 1


def test_plot_all_renders_committed_artifacts(tmp_path, monkeypatch):
    from scripts import plot_all

    repo = os.path.join(os.path.dirname(__file__), "..")
    monkeypatch.chdir(repo)
    out = tmp_path / "plots"
    assert plot_all.main(["--out", str(out)]) == 0
    made = sorted(os.listdir(out))
    assert made == ["bop.png", "device_resident.png", "gemm.png",
                    "interleave.png", "lr.png", "models.png", "ooc.png",
                    "pallas_gram.png", "tsqr.png"]
    for f in made:
        assert (out / f).stat().st_size > 10_000  # a real figure


def test_plot_all_renders_overhead_artifacts(tmp_path, monkeypatch):
    """The interleave / device-resident figures render once their CSVs
    exist (they are produced by the hardware batch, steps 6b/6c)."""
    from scripts import plot_all

    monkeypatch.chdir(tmp_path)
    (tmp_path / "result_interleave_tpu.csv").write_text(
        "mode,N,d,path,median_s,min_s,sweeps_s,chain,lane_pad\n"
        "interleave,125000,1000,pure_jax,0.0055,0.0054,x,5,1\n"
        "interleave,125000,1000,blockarray,0.0056,0.0055,x,5,1\n"
    )
    (tmp_path / "result_device_resident_tpu.csv").write_text(
        "mode,N,d,phys_n,phys_d,route,iters_lo,iters_hi,"
        "t_lo_median_s,t_hi_median_s,per_iter_s,reps\n"
        "device_resident,2500000,1000,2500000,1024,xla,5,20,"
        "0.2,0.6,0.0265,5\n"
        "device_resident,2500000,1000,2500000,1024,pallas,5,20,"
        "0.15,0.4,0.0168,5\n"
    )
    out = tmp_path / "plots"
    assert plot_all.main(["--out", str(out)]) == 0
    made = sorted(os.listdir(out))
    # bop/lr always render (reference-constant series); the two new
    # figures must appear because their CSVs exist here.
    for f in ("device_resident.png", "interleave.png"):
        assert f in made
        assert (out / f).stat().st_size > 10_000
