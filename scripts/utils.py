"""Benchmark harness (parity: reference scripts/utils.py benchmark_func —
warmup + repeat + CSV row emission)."""

import time

import numpy as np


def benchmark_func(func, warmup=1, repeat=5):
    """Run func() warmup+repeat times; returns (min_s, mean_s, std_s).

    func must synchronize internally (fetch a scalar) — see
    .claude/skills/verify/SKILL.md for why block_until_ready is not enough
    on tunneled TPU transports.
    """
    for _ in range(warmup):
        func()
    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        func()
        times.append(time.perf_counter() - t0)
    arr = np.array(times)
    return float(arr.min()), float(arr.mean()), float(arr.std())


def benchmark_chained(enqueue, sync, warmup=1, repeat=5, chain=5,
                      with_median=False):
    """Amortized-sync timing: enqueue `chain` async executions, sync once.

    The host↔device scalar fetch costs ~20-25ms on tunneled transports;
    per-iteration syncing would swamp small workloads. Comparable to the
    reference baselines, which synchronized on-device.
    Returns (min_s, mean_s, std_s[, median_s]) per execution.

    NOTE: with lazy batching on (the default), `enqueue` must force
    dispatch (e.g. return BlockArray.raw) — a bare BlockArray op only
    builds a deferred DAG node and no device work starts.
    """
    for _ in range(warmup):
        sync(enqueue())
    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = enqueue()
        sync(out)
        times.append((time.perf_counter() - t0) / chain)
    arr = np.array(times)
    out = (float(arr.min()), float(arr.mean()), float(arr.std()))
    if with_median:
        out += (float(np.median(arr)),)
    return out


def append_csv(path, row: dict):
    import csv
    import os

    exists = os.path.isfile(path)
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row.keys()))
        if not exists:
            w.writeheader()
        w.writerow(row)
