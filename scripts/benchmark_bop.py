"""x.T @ x sweep (parity: reference scripts/benchmark_bop.py:97-161).

Sweeps N with d=1000 fp32 and records wall-clock seconds per N to CSV,
comparable row-for-row with the reference's result_bop.csv.

Usage: python scripts/benchmark_bop.py [--out result_bop_tpu.csv]
"""

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp


def make_x(n, d, backend):
    """On-device generation DIRECTLY in at-rest form: under
    NUMS_TPU_LANE_PAD=1 (what bench.py sets) the buffer is 128-aligned
    with zero pad columns, so x.T@x rides the symmetric Pallas kernel
    with no relayout copy (same construction as bench.py)."""
    from nums_tpu.core.array.blockarray import BlockArray
    from nums_tpu.core.grid import ArrayGrid

    pshape = backend.physical_shape((n, d))

    @jax.jit
    def gen():
        i = jax.lax.broadcasted_iota(jnp.float32, pshape, 0)
        j = jax.lax.broadcasted_iota(jnp.float32, pshape, 1)
        vals = jnp.sin(i * 1e-5) + jnp.cos(j * 0.37) * 0.5
        if pshape != (n, d):
            vals = jnp.where((i < n) & (j < d), vals, 0.0)  # zero pads
        return vals

    block_rows = max(1, n // max(1, backend.num_devices))
    grid = ArrayGrid((n, d), (block_rows, d), "float32")
    return BlockArray(gen(), grid, backend)


def interleave(args, app):
    """Interleaved same-chip A/B: the identical chained xTx through
    (a) a raw ``jax.jit`` kernel on the BlockArray's own buffer and
    (b) the full BlockArray lazy-dispatch path.

    This is the committed artifact behind RESULTS.md's "run-to-run
    spread" table (pure jax vs BlockArray): path sweeps ALTERNATE
    (a,b,a,b,...) so tunnel/chip drift lands on both paths equally and
    the delta isolates framework dispatch overhead. Both paths ride the
    same XLA dot_general (lane padding is NOT forced here; at d=1000
    the unaligned shape keeps the Pallas gram off on both sides — the
    row records ``lane_pad`` so the artifact is self-describing).
    """
    import time

    from scripts.utils import append_csv
    from nums_tpu.core import settings

    d = args.d
    chain = args.chain

    def one_sweep(enqueue, sync):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = enqueue()
        sync(out)
        return (time.perf_counter() - t0) / chain

    for n in [int(x) for x in args.ns.split(",")]:
        try:
            X = make_x(n, d, app.backend)
        except Exception as e:  # OOM etc: skip the N, keep the batch
            print(f"N={n}: build FAILED ({type(e).__name__})")
            continue
        pure = jax.jit(lambda a: jnp.matmul(a.T, a))

        def enq_pure():
            return pure(X.data)

        def enq_block():
            return (X.T @ X).raw

        def sync(Z):
            float(Z[0, 0])

        sync(enq_pure())  # compile + warmup both paths
        sync(enq_block())
        t_pure, t_block = [], []
        for _ in range(args.reps):
            t_pure.append(one_sweep(enq_pure, sync))
            t_block.append(one_sweep(enq_block, sync))
        del X
        for path, times in (("pure_jax", t_pure), ("blockarray", t_block)):
            row = {
                "mode": "interleave", "N": n, "d": d, "path": path,
                "median_s": round(float(np.median(times)), 5),
                "min_s": round(float(np.min(times)), 5),
                "sweeps_s": ";".join(f"{t:.5f}" for t in times),
                "chain": chain, "lane_pad": int(bool(settings.lane_pad)),
            }
            append_csv(args.out, row)
            print(f"N={n} {path}: median {row['median_s']}s "
                  f"min {row['min_s']}s")
        overhead = np.median(t_block) / np.median(t_pure) - 1.0
        print(f"N={n}: BlockArray dispatch overhead {overhead * 100:+.2f}%")
    return 0


def device_resident(args, app):
    """In-program loop timing: the committed artifact behind RESULTS.md's
    "device-resident 2.65 ms" figure.

    Runs the gram inside ONE jitted ``fori_loop`` so the per-iteration
    cost excludes every host-side overhead (dispatch, tunnel RPC, the
    scalar fetch). Two defenses keep the measurement honest:

    * the gram input passes through ``lax.optimization_barrier``
      BUNDLED with the loop carry, so its per-iteration value depends
      on the carry and XLA cannot hoist the dot out of the loop (an
      identity fence — no copy, unlike carrying the 10 GB matrix in
      the loop state, which would double HBM and OOM at N=2.5M); the
      body consumes ``sum(G)`` (a [0,0] probe could legally be
      rewritten to a sliced dot);
    * per-iteration time is the DIFFERENCE quotient between a long and a
      short loop — (T(hi) - T(lo)) / (hi - lo) — which cancels the
      fixed costs (the input copy into the loop state, dispatch, and
      the fetch) that a single-loop average would smear in.

    One row per available route: ``xla`` always, ``pallas`` when the
    symmetric kernel is enabled and supports the physical shape.
    """
    import time

    from scripts.utils import append_csv
    from nums_tpu.core.ops import pallas_gram

    d = args.d
    lo, hi = args.iters_lo, args.iters_hi
    assert hi > lo > 0

    def loop_fn(op, iters):
        @jax.jit
        def run(X):
            def body(_, acc):
                Xc, acc = jax.lax.optimization_barrier((X, acc))
                G = op(Xc)
                return acc + jnp.sum(G).astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return run

    for n in [int(x) for x in args.ns.split(",")]:
        try:
            # .raw = the physical (padded) at-rest buffer: .data would
            # slice back to the logical width — dropping the lane pad
            # (so the pallas route never qualifies) AND materializing a
            # second (n, d) copy (OOM at the 2.5M headline size).
            X = make_x(n, d, app.backend).raw
        except Exception as e:  # OOM etc: skip the N, keep the batch
            print(f"N={n}: build FAILED ({type(e).__name__})")
            continue
        pn, pd = X.shape
        routes = [("xla", lambda a: jnp.matmul(a.T, a))]
        if pallas_gram.enabled() and pallas_gram.supported(X.shape, X.dtype):
            routes.append(("pallas", pallas_gram.gram))
        for route, op in routes:
            try:
                run_lo, run_hi = loop_fn(op, lo), loop_fn(op, hi)
                float(run_lo(X)), float(run_hi(X))  # compile + warmup
                t_lo, t_hi = [], []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    float(run_lo(X))
                    t_lo.append(time.perf_counter() - t0)
                    t0 = time.perf_counter()
                    float(run_hi(X))
                    t_hi.append(time.perf_counter() - t0)
            except Exception as e:  # per-route isolation for the batch
                print(f"N={n} {route}: FAILED ({type(e).__name__})")
                continue
            per_iter = (float(np.median(t_hi)) - float(np.median(t_lo))) \
                / (hi - lo)
            row = {
                "mode": "device_resident", "N": n, "d": d,
                "phys_n": pn, "phys_d": pd, "route": route,
                "iters_lo": lo, "iters_hi": hi,
                "t_lo_median_s": round(float(np.median(t_lo)), 5),
                "t_hi_median_s": round(float(np.median(t_hi)), 5),
                "per_iter_s": round(per_iter, 6), "reps": args.reps,
            }
            append_csv(args.out, row)
            tf = 2.0 * pn * pd * pd / max(per_iter, 1e-12) / 1e12
            print(f"N={n} {route}: {per_iter * 1e3:.3f} ms/iter "
                  f"({tf:.1f} TFLOP/s)")
        del X
    return 0


def main(argv=None):
    sys.path.insert(0, ".")
    from scripts.utils import benchmark_chained, append_csv

    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=None)
    parser.add_argument("-d", type=int, default=1000)
    parser.add_argument(
        "--ns", default="125000,250000,1250000,2500000",
        help="comma-separated N values (larger Ns need >16GB HBM)",
    )
    parser.add_argument(
        "--interleave", action="store_true",
        help="alternating pure-jax vs BlockArray A/B rows "
             "(dispatch-overhead artifact; separate default CSV)",
    )
    parser.add_argument(
        "--device-resident", action="store_true",
        help="in-program fori_loop gram per route "
             "(device-resident throughput artifact; separate default CSV)",
    )
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--chain", type=int, default=5)
    parser.add_argument("--iters-lo", type=int, default=5)
    parser.add_argument("--iters-hi", type=int, default=20)
    args = parser.parse_args(argv)
    if args.out is None:
        args.out = ("result_interleave_tpu.csv" if args.interleave
                    else "result_device_resident_tpu.csv"
                    if args.device_resident else "result_bop_tpu.csv")

    import nums_tpu

    app = nums_tpu.init()
    if args.interleave:
        return interleave(args, app)
    if args.device_resident:
        return device_resident(args, app)
    d = args.d
    for n in [int(x) for x in args.ns.split(",")]:
        try:
            X = make_x(n, d, app.backend)

            # .raw forces the lazy expression INTO async dispatch (work
            # starts now, no block) so chaining measures real executions.
            tmin, tmean, tstd = benchmark_chained(
                lambda: (X.T @ X).raw, lambda Z: float(Z[0, 0])
            )
            del X
        except Exception as e:  # OOM etc: record failure like the reference
            print(f"N={n}: FAILED ({type(e).__name__})")
            append_csv(args.out, {"N": n, "d": d, "min_s": -1.0,
                                  "mean_s": -1.0, "std_s": -1.0})
            continue
        flops = 2.0 * n * d * d
        print(
            f"N={n}: min {tmin:.4f}s mean {tmean:.4f}s "
            f"({flops / tmin / 1e12:.1f} TFLOP/s)"
        )
        append_csv(args.out, {"N": n, "d": d, "min_s": round(tmin, 5),
                              "mean_s": round(tmean, 5),
                              "std_s": round(tstd, 5)})
    return 0


if __name__ == "__main__":
    sys.exit(main())
