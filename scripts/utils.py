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
    """Append one row; if the row introduces columns the existing file
    lacks (schema evolved between rounds), rewrite the file under the
    union header (old rows get "" in the new columns) instead of
    silently misaligning values against the old header."""
    import csv
    import os

    exists = os.path.isfile(path)
    if exists:
        with open(path, newline="") as f:
            reader = csv.DictReader(f)
            old_fields = reader.fieldnames or []
            if set(row.keys()) - set(old_fields):
                fields = list(old_fields) + [
                    k for k in row.keys() if k not in old_fields
                ]
                rows = list(reader)
                with open(path, "w", newline="") as g:
                    w = csv.DictWriter(g, fieldnames=fields,
                                       restval="")
                    w.writeheader()
                    w.writerows(rows)
                    w.writerow(row)
                return
            fields = old_fields
    else:
        fields = list(row.keys())
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields, restval="")
        if not exists:
            w.writeheader()
        w.writerow(row)
