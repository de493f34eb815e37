"""The perf-regression gate must actually fail on a regression
(VERDICT r2 weak #2 was exactly a silent artifact drift)."""

import csv
import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "check_perf",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "check_perf.py"),
)
check_perf = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_perf)


def _write_gemm(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["n", "dtype", "min_s", "median_s", "tflops",
                           "protocol"]
        )
        w.writeheader()
        for r in rows:
            w.writerow(r)


def _row(n, tflops):
    return {"n": n, "dtype": "bfloat16", "min_s": 0.05,
            "median_s": 0.05, "tflops": tflops, "protocol": "test"}


def test_gemm_floor_passes_and_fails(tmp_path):
    good = tmp_path / "good.csv"
    _write_gemm(good, [_row(16384, 177.9), _row(32768, 184.2)])
    failures = []
    check_perf.check_gemm_csv(str(good), failures)
    assert not failures

    bad = tmp_path / "bad.csv"
    _write_gemm(bad, [_row(16384, 150.0), _row(32768, 184.2)])
    failures = []
    check_perf.check_gemm_csv(str(bad), failures)
    assert failures and "16384" in failures[0]

    missing_row = tmp_path / "partial.csv"
    _write_gemm(missing_row, [_row(16384, 177.9)])
    failures = []
    check_perf.check_gemm_csv(str(missing_row), failures)
    assert failures  # absent 32k row is a failure, not a silent skip


def test_bench_floor():
    failures = []
    check_perf.check_bench_payload({"vs_baseline": 2.0}, "t", failures)
    assert not failures
    check_perf.check_bench_payload({"vs_baseline": 1.2}, "t", failures)
    assert failures
    assert check_perf.BENCH_FLOOR_X >= 1.5  # stays a real floor
    failures = []
    check_perf.check_bench_payload({}, "t", failures)
    assert failures  # missing field must not pass silently


def _write_tsqr(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["op", "m", "n", "min_s"])
        w.writeheader()
        for r in rows:
            w.writerow(r)


def test_tsqr_floor_passes_and_fails(tmp_path):
    good = tmp_path / "good.csv"
    _write_tsqr(good, [
        {"op": "indirect_tsr", "m": 2**24, "n": 128, "min_s": 0.032},
        {"op": "direct_tsqr", "m": 2**24, "n": 128, "min_s": 0.168},
    ])
    failures = []
    check_perf.check_tsqr_csv(str(good), failures)
    assert not failures

    bad = tmp_path / "bad.csv"
    _write_tsqr(bad, [
        {"op": "indirect_tsr", "m": 2**24, "n": 128, "min_s": 0.2},
        {"op": "direct_tsqr", "m": 2**24, "n": 128, "min_s": 0.168},
    ])
    failures = []
    check_perf.check_tsqr_csv(str(bad), failures)
    assert failures and "indirect_tsr" in failures[0]

    partial = tmp_path / "partial.csv"
    _write_tsqr(partial, [
        {"op": "indirect_tsr", "m": 2**24, "n": 128, "min_s": 0.032},
    ])
    failures = []
    check_perf.check_tsqr_csv(str(partial), failures)
    assert failures  # absent direct_tsqr row must not pass silently


def _write_ooc(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["op", "N", "d", "mode", "seconds", "tflops",
                           "note"]
        )
        w.writeheader()
        for r in rows:
            w.writerow(r)


def test_ooc_floor_passes_and_fails(tmp_path):
    row = {"op": "gram", "N": 20_000_000, "d": 1000, "mode": "device",
           "seconds": 0.31, "tflops": 129.0, "note": "t"}
    good = tmp_path / "good.csv"
    _write_ooc(good, [row])
    failures = []
    check_perf.check_ooc_csv(str(good), failures)
    assert not failures

    bad = tmp_path / "bad.csv"
    _write_ooc(bad, [dict(row, seconds=0.9)])
    failures = []
    check_perf.check_ooc_csv(str(bad), failures)
    assert failures and "gram 20M" in failures[0]

    empty = tmp_path / "empty.csv"
    _write_ooc(empty, [dict(row, mode="disk")])
    failures = []
    check_perf.check_ooc_csv(str(empty), failures)
    assert failures  # no device-mode 20M row must not pass silently


def test_committed_artifacts_pass_the_gate():
    """The repo's own checked-in artifacts must satisfy the floors —
    this is the drift guard between CSV/RESULTS.md and the gate."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    failures = []
    check_perf.check_gemm_csv(
        os.path.join(repo, "result_gemm_tpu.csv"), failures
    )
    check_perf.check_tsqr_csv(
        os.path.join(repo, "result_tsqr_tpu.csv"), failures
    )
    check_perf.check_ooc_csv(
        os.path.join(repo, "result_ooc_tpu.csv"), failures
    )
    cwd = os.getcwd()
    os.chdir(repo)
    try:
        payload, path = check_perf.latest_bench_record()
    finally:
        os.chdir(cwd)
    if payload is not None:
        check_perf.check_bench_payload(payload, "record", failures)
    assert not failures, failures
