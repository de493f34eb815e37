"""A/B + calibration sweep for the symmetric Pallas gram kernel.

Produces the committed artifact behind RESULTS.md's kernel claims
(VERDICT r4 weak #5: the 1.36-1.66x A/B lived only in prose) and the
single-chip calibration data (VERDICT r4 next #7): for each (n, d) it
times the plain XLA dot_general gram against the Pallas kernel — and
the weighted (Hessian) variants: XLA's materialized (√s·X)ᵀ(√s·X)
against the kernel's fused per-row scale.

Sweeps:
  default      — d in {512, 1024, 1280, 2048} x N in {1M, 2.5M-ish},
                 plus the lane-pad headline pair (logical 1000 → 1024).
  --crossover  — logical d in {256, 384, 512, 640, 768, 1000} compared
                 as XLA@d vs Pallas@pad128(d): the d where the kernel
                 (on the padded width) beats XLA (on the logical width)
                 calibrates settings.lane_pad_min.
  --rows-sweep — vary the kernel's VMEM row-chunk size at the headline
                 shape to calibrate the VMEM_BUDGET/rows heuristic.

CSV schema: op,route,n,d,rows,min_s,median_s,tflops,note
(`rows` = kernel chunk rows, empty for XLA routes; tflops uses the
LOGICAL 2·n·d² of the route's own d).

Run on the TPU: python scripts/benchmark_pallas_gram.py
Schema smoke on CPU (interpret, tiny): --smoke
"""

import argparse
import os
import sys
import time


def _median(xs):
    ys = sorted(xs)
    return ys[len(ys) // 2]


def _time_op(fn, sync, reps, chain=5):
    """Per-execution seconds under the amortized-sync protocol: chain
    ``chain`` async dispatches, ONE scalar fetch, divide (identical to
    ``scripts/utils.benchmark_chained`` / bench.py). A per-rep fetch
    costs ~20-25 ms through the tunneled transport and inflated every
    row of the round-5 first capture by one fetch — 0.0516 s for the
    headline gram that bench.py's chained protocol measures at
    0.0253 s — compressing every A/B ratio toward 1."""
    fn()  # compile + warmup
    sync(fn())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(chain):
            out = fn()
        sync(out)
        times.append((time.perf_counter() - t0) / chain)
    return min(times), _median(times)


def main(argv=None):
    sys.path.insert(0, ".")
    from scripts.utils import append_csv

    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="result_pallas_gram_tpu.csv")
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--smoke", action="store_true",
                        help="tiny shapes on CPU interpret mode "
                             "(schema/plumbing check only)")
    parser.add_argument("--crossover", action="store_true")
    parser.add_argument("--rows-sweep", action="store_true")
    parser.add_argument("--newton", action="store_true",
                        help="A/B one full Newton LR step: XLA chain "
                             "(3 HBM reads of X) vs gram kernel (2) vs "
                             "fused Newton-stats kernel (1)")
    args = parser.parse_args(argv)

    if args.smoke:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=1"
            ).strip()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from nums_tpu.core.ops import pallas_gram

    def sync(out):
        tree = jax.tree_util.tree_leaves(out)
        if tree:
            float(np.asarray(tree[0].ravel()[0]))

    def gen(n, d, d_logical=None):
        """Deterministic fp32 (n, d) with zero pad columns beyond
        d_logical (matches the headline bench's at-rest layout)."""
        dl = d if d_logical is None else d_logical

        @jax.jit
        def make():
            i = jax.lax.broadcasted_iota(jnp.float32, (n, d), 0)
            j = jax.lax.broadcasted_iota(jnp.float32, (n, d), 1)
            v = jnp.sin(i * 1e-5) + jnp.cos(j * 0.37) * 0.5
            return jnp.where(j < dl, v, 0.0)

        return make()

    xla_gram = jax.jit(lambda x: x.T @ x)
    xla_wgram = jax.jit(lambda x, s: (x * jnp.sqrt(s)[:, None]).T @ x)

    def record(op, route, n, d, rows, min_s, med_s, note=""):
        tf = 2.0 * n * d * d / min_s / 1e12
        append_csv(args.out, {
            "op": op, "route": route, "n": n, "d": d,
            "rows": rows if rows is not None else "",
            "min_s": round(min_s, 5), "median_s": round(med_s, 5),
            "tflops": round(tf, 2), "note": note,
        })
        print(f"{op:14s} {route:7s} n={n:<9d} d={d:<5d} rows={rows} "
              f"min={min_s:.5f}s med={med_s:.5f}s {tf:7.1f} TF {note}")

    def measure(fn, op, route, n, d, rows, note=""):
        """Time + record, never crash the sweep: one OOM/compile error
        must cost one row, not every row after it (this script IS the
        round's evidence artifact)."""
        try:
            mn, md = _time_op(fn, sync, reps)
        except Exception as e:  # noqa: BLE001 - record and continue
            print(f"SKIP {op}/{route} n={n} d={d}: "
                  f"{type(e).__name__}: {e}", file=sys.stderr, flush=True)
            return
        record(op, route, n, d, rows, mn, md, note)

    # Weighted-XLA A/B leg gate: that route materializes sqrt(s)*x, so
    # it transiently holds TWO (n, d) f32 buffers. Skip it where 2x
    # does not fit the chip (v5e: 16 GB HBM; budget leaves headroom for
    # the (d, d) output + runtime) — a deliberate "route impossible at
    # this scale" datapoint, not a lost row.
    hbm_budget = float(os.environ.get("NUMS_TPU_BENCH_HBM_GB", "14")) * 1e9

    reps = args.reps

    if args.rows_sweep:
        n, d = (200_000, 1024) if not args.smoke else (4096, 256)
        x = gen(n, d)
        planned = pallas_gram._plan(n, d)[0]
        for rows in sorted({128, 256, 512, planned, 896, 1024, 1536}):
            if rows > n // 4:
                continue
            call = pallas_gram._gram_call(n, d, rows)
            fn = jax.jit(lambda x, c=call: c(x))
            try:
                mn, md = _time_op(lambda: fn(x), sync, reps)
            except Exception as e:  # noqa: BLE001 - record and continue
                print(f"rows={rows}: {type(e).__name__}: {e}")
                continue
            note = "planned" if rows == planned else ""
            record("gram_rows", "pallas", n, d, rows, mn, md, note)
        return 0

    if args.newton:
        # One full Newton LR step (forward + gradient + Hessian +
        # solve) per route; same padded generator as the lr benchmark.
        # Fresh jax.jit per route: the route gates (enabled()) are read
        # at trace time, so reusing the cached step would freeze the
        # first route measured.
        import functools

        from nums_tpu.models import fast_glm

        if args.smoke:
            shapes = [(8192, 256, 250)]
        else:
            shapes = [(1_000_000, 1024, 1000), (2_500_000, 1024, 1000)]
        for n, dp, dl in shapes:
            x = gen(n, dp, d_logical=dl)
            y = (jnp.sin(jnp.arange(n, dtype=jnp.float32) * 0.77)
                 > 0).astype(jnp.float32)
            beta = jnp.zeros((dp,), jnp.float32)
            routes = (
                ("xla", {"NUMS_TPU_PALLAS_NEWTON": "0"}, False),
                ("gram", {"NUMS_TPU_PALLAS_NEWTON": "0",
                          "NUMS_TPU_PALLAS_GRAM": "1"}, True),
                ("fused", {"NUMS_TPU_PALLAS_NEWTON": "1"}, True),
            )
            for route, env, pallas in routes:
                saved = {k: os.environ.get(k) for k in env}
                os.environ.update(env)
                try:
                    fn = jax.jit(functools.partial(
                        fast_glm.logistic_newton_step,
                        pallas=pallas, pad_from=dl,
                    ))
                    measure(lambda: fn(x, y, beta), "newton_step",
                            route, n, dp, None,
                            f"full step, logical d={dl}")
                finally:
                    for k, v in saved.items():
                        if v is None:
                            os.environ.pop(k, None)
                        else:
                            os.environ[k] = v
            del x, y
        return 0

    if args.crossover:
        n = 1_000_000 if not args.smoke else 8192
        for dl in (256, 384, 512, 640, 768, 1000):
            dp = -(-dl // 128) * 128
            x_l = gen(n, dl)
            measure(lambda: xla_gram(x_l), "gram", "xla", n, dl, None,
                    "logical width")
            del x_l
            if not pallas_gram.supported((n, dp), np.float32):
                continue
            x_p = gen(n, dp, d_logical=dl)
            measure(lambda: pallas_gram.gram(x_p), "gram", "pallas",
                    n, dp, pallas_gram._plan(n, dp)[0],
                    f"lane-padded from d={dl}")
            del x_p
        return 0

    # Default A/B sweep.
    if args.smoke:
        shapes = [(8192, 256), (8192, 512)]
        headline = (8192, 1024, 1000)
    else:
        # Includes the exact RESULTS.md round-4 A/B shapes (2.4M x 1024,
        # 5M x 512, 1M x 256) so the refresh replaces prose 1:1.
        shapes = [(1_000_000, 256), (5_000_000, 512),
                  (2_400_000, 1024), (1_000_000, 1280), (500_000, 2048)]
        headline = (2_500_000, 1024, 1000)
    for n, d in shapes:
        x = gen(n, d)
        s = jnp.abs(jnp.sin(jnp.arange(n, dtype=jnp.float32))) + 0.01
        measure(lambda: xla_gram(x), "gram", "xla", n, d, None)
        if pallas_gram.supported((n, d), np.float32):
            rows = pallas_gram._plan(n, d)[0]
            measure(lambda: pallas_gram.gram(x), "gram", "pallas",
                    n, d, rows)
            if 2.0 * n * d * 4 < hbm_budget:
                measure(lambda: xla_wgram(x, s), "gram_weighted", "xla",
                        n, d, None, "materialized sqrt(s)*x")
            else:
                print(f"SKIP gram_weighted/xla n={n} d={d}: "
                      "materialized sqrt(s)*x needs 2 full operands "
                      f"(> {hbm_budget / 1e9:.0f} GB budget)",
                      file=sys.stderr, flush=True)
            measure(lambda: pallas_gram.gram(x, s), "gram_weighted",
                    "pallas", n, d, rows, "fused in-kernel scale")
        del x, s

    # Headline pair: logical d=1000 stored lane-padded at 1024.
    n, dp, dl = headline
    x = gen(n, dp, d_logical=dl)
    measure(lambda: xla_gram(x), "gram", "xla", n, dp, None,
            f"padded buffer, logical d={dl}")
    if pallas_gram.supported((n, dp), np.float32):
        rows = pallas_gram._plan(n, dp)[0]
        measure(lambda: pallas_gram.gram(x), "gram", "pallas", n, dp,
                rows, f"padded buffer, logical d={dl} (headline)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
