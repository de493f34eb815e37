"""Out-of-core benchmark rows: xTx and 1-step Newton LR at N >= 5M.

The reference posts these rows on 8 GPUs holding the whole matrix in
device memory (`scripts/result_bop.csv` rows 5M-20M there). A 5M x 1000
fp32 matrix is 20 GB — larger than one v5e's HBM — so here they run
through the OOC subsystem: the design matrix lives on disk as a
DiskArray and panels stream through the chip with O(panel + accumulator)
HBM.

Two modes per op (both recorded in ``result_ooc_tpu.csv``):

- ``device``: panels are GENERATED on-device inside one scanned program
  — the device-resident per-pass figure (what the accumulate path
  sustains when the feed runs at HBM/PCIe speed, i.e. on
  locally-attached hardware).
- ``disk``: the real end-to-end DiskArray path. On THIS container the
  host->device hop is an ~15 MB/s ssh tunnel, so the number is
  transport-bound and documented as such; on locally-attached TPU
  (PCIe ~10+ GB/s) the device figure is the expectation.

Usage:
  python scripts/benchmark_ooc.py --n 5000000 --op gram --mode device
  python scripts/benchmark_ooc.py --n 5000000 --op lr --mode disk
"""

import argparse
import os
import shutil
import sys
import time

import numpy as np


def _gen_host_panel(start, rows, d, dtype):
    """Deterministic data: column j is a SAWTOOTH with its own
    irrational-step frequency, so columns are near-orthogonal and the
    design matrix is full rank with a healthy spectrum (measured
    cond(H) <= 3 across widths/offsets incl. the mod wrap — the Newton
    solve stays far above single-pass-MAC noise at any N). Two earlier
    forms each failed one requirement: the round-3 shared-frequency
    sawtooth had near-duplicate columns (H singular by construction),
    and the round-5 per-column SINUSOID fixed that but cost one
    transcendental per element — at 20M x 1000 the device-mode gram
    regressed 0.31 -> 0.70 s because 2e10 sins dominated the very
    accumulate path the benchmark claims to measure."""
    i = (np.arange(start, start + rows, dtype=np.float32)[:, None]
         % 104729.0)
    j = np.arange(d, dtype=np.float32)[None, :]
    return (
        ((i * (0.6180339887 + j * 7.3e-4) + j * 0.2516) % 1.0) - 0.5
    ).astype(dtype)


def main(argv=None):
    sys.path.insert(0, ".")
    from scripts.utils import append_csv

    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=5_000_000)
    parser.add_argument("--d", type=int, default=1000)
    parser.add_argument("--op", choices=["gram", "lr"], default="gram")
    parser.add_argument("--mode", choices=["device", "disk"],
                        default="device")
    parser.add_argument("--panel-rows", type=int, default=250_000)
    parser.add_argument("--out", default="result_ooc_tpu.csv")
    parser.add_argument("--keep-disk", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import nums_tpu

    app = nums_tpu.init()
    n, d, rows = args.n, args.d, args.panel_rows
    assert n % rows == 0, (n, rows)
    k_panels = n // rows
    dtype = jnp.float32

    if args.mode == "device":
        # One program: scan over panels generated in-kernel; measures
        # the pure accumulate path (gen cost is a few % of the GEMM).
        #
        # Lane-padded symmetric route (round 4): generating panels at a
        # 128-aligned width with ZERO pad columns is free (the
        # generator is elementwise), and the symmetric Pallas gram then
        # takes each panel's contraction — upper-triangular tile pairs
        # only, ~44% fewer MXU FLOPs than XLA's full dot_general. Zero
        # pads contribute zero, so the padded accumulator's logical
        # corner is exactly the unpadded result; slice once at the end.
        #
        # use_pallas defaults OFF here — in THIS mode only. The panels
        # are GENERATED in-program, and XLA fuses the generator into
        # its own dot_general (the panel never exists in HBM), while a
        # Pallas custom call forces the full (rows, dp) panel to
        # materialize first; measured on v5e 2026-08-19 at 20M x 1000:
        # XLA-fused 0.3025 s vs kernel 0.700 s. Production OOC paths
        # (real panels already resident in HBM — streaming.py,
        # gram_ooc, newton_fit_ooc) keep the kernel, where its FLOP cut
        # wins (see result_pallas_gram_tpu.csv). NUMS_TPU_PALLAS_GRAM=1
        # forces the kernel route for A/B.
        from nums_tpu.core.ops import pallas_gram, pallas_newton

        def lane_width(width):
            w = -(-width // 128) * 128
            if os.environ.get(
                "NUMS_TPU_PALLAS_GRAM"
            ) == "1" and pallas_gram.supported((rows, w), np.float32):
                return w, True
            return width, False

        def gen_panel(pi, width, dp, intercept=False):
            """Panel at physical width ``dp``: data columns < width,
            an intercept column AT ``width`` if asked, zero pads after
            (the formula matches ``_gen_host_panel`` column-for-column
            so device and disk modes compute the same statistics)."""
            i = (pi * rows + jax.lax.broadcasted_iota(
                jnp.float32, (rows, dp), 0)) % 104729.0
            j = jax.lax.broadcasted_iota(jnp.float32, (rows, dp), 1)
            vals = ((i * (0.6180339887 + j * 7.3e-4) + j * 0.2516)
                    % 1.0) - 0.5
            jj = jax.lax.broadcasted_iota(jnp.int32, (rows, dp), 1)
            if intercept:
                vals = jnp.where(jj == width, 1.0, vals)
            if dp > width + (1 if intercept else 0):
                keep = jj <= width if intercept else jj < width
                vals = jnp.where(keep, vals, 0.0)
            return vals

        if args.op == "gram":
            dp, use_pallas = lane_width(d)

            @jax.jit
            def run():
                def body(G, pi):
                    p = gen_panel(pi, d, dp)
                    if use_pallas:
                        return G + pallas_gram.gram(p), None
                    return G + p.T @ p, None
                G, _ = jax.lax.scan(
                    body, jnp.zeros((dp, dp), dtype),
                    jnp.arange(k_panels, dtype=jnp.float32),
                )
                return G[:d, :d]

            sync = lambda out: float(np.asarray(out[0, 0]))
        else:  # one Newton step of logistic regression
            da_, use_pallas = lane_width(d + 1)

            @jax.jit
            def run():
                beta = jnp.zeros((da_,), dtype)

                def body(carry, pi):
                    g, H = carry
                    pa = gen_panel(pi, d, da_, intercept=True)
                    # beta is zeros here, so eta = 0 and the synthetic
                    # label y = (eta > 0) is identically zero — the
                    # fused path passes that constant directly.
                    if use_pallas and pallas_newton.enabled() and (
                        pallas_newton.supported((rows, da_), np.float32)
                    ):
                        # Production route (glm_stats_update_aug):
                        # eta, link chain, g, and the weighted
                        # symmetric Hessian in ONE HBM read of the
                        # panel.
                        pg, pH = pallas_newton.stats(
                            pa, jnp.zeros((rows,), dtype), beta,
                            "logistic",
                        )
                        return (g + pg, H + pH), None
                    eta = pa @ beta
                    mu = jax.nn.sigmoid(eta)
                    y = (eta > 0).astype(dtype)
                    s = mu * (1.0 - mu)
                    g = g + pa.T @ (mu - y)
                    if use_pallas:
                        # H += paᵀ diag(s) pa via the kernel's fused
                        # per-row scale; no materialized √s·pa HBM
                        # round-trip.
                        H = H + pallas_gram.gram(pa, s)
                    else:
                        H = H + (pa * s[:, None]).T @ pa
                    return (g, H), None

                (g, H), _ = jax.lax.scan(
                    body,
                    (jnp.zeros((da_,), dtype),
                     jnp.zeros((da_, da_), dtype)),
                    jnp.arange(k_panels, dtype=jnp.float32),
                )
                # Pad rows/cols of H are zero; the scale-aware ridge
                # makes them a benign identity block (and keeps the
                # pivot floor above single-pass-MAC noise at any N),
                # and g's pads are zero, so the padded solve's logical
                # entries equal the unpadded one.
                ridge = 1e-6 * (jnp.trace(H) / da_ + 1.0)
                L = jnp.linalg.cholesky(
                    H + ridge * jnp.eye(da_, dtype=dtype))
                step = jax.scipy.linalg.cho_solve((L, True), g)
                return (beta - step)[:d + 1]

            sync = lambda out: float(np.asarray(out[0]))

        sync(run())  # compile + warmup
        t0 = time.perf_counter()
        sync(run())
        t = time.perf_counter() - t0
        note = "device-resident per-pass (panels generated on device)"
    else:
        from nums_tpu.core.array.diskarray import DiskArray

        path = os.path.join(
            os.environ.get("NUMS_TPU_OOC_DIR", "/tmp/nums_tpu_ooc"),
            f"bench_{n}_{d}",
        )
        if not os.path.isdir(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            print(f"writing {n}x{d} fp32 DiskArray to {path} ...",
                  flush=True)
            panels = (
                _gen_host_panel(s, rows, d, np.float32)
                for s in range(0, n, rows)
            )
            DiskArray.from_panels(
                path, app.fs, panels, (n, d), np.float32, rows)
        da = app.open_fs(path)
        t0 = time.perf_counter()
        if args.op == "gram":
            G = app.gram_ooc(da)
            float(G[0, 0])
        else:
            from nums_tpu.models import fast_glm

            y = (np.arange(n) % 2).astype(np.float32)
            beta, gmax, _ = fast_glm.newton_fit_ooc(
                da, y, tol=0.0, kind="logistic", max_iter=1)
            float(np.asarray(beta[0]))
        t = time.perf_counter() - t0
        note = "end-to-end DiskArray (transport-bound through the tunnel)"
        if not args.keep_disk:
            shutil.rmtree(path, ignore_errors=True)

    # Both ops are dominated by one (d, n) @ (n, d) contraction per pass
    # (gram: XᵀX; LR: XᵀSX — the forward/gradient GEMVs are O(nd)).
    flops = 2.0 * n * d * d
    row = {
        "op": args.op, "N": n, "d": d, "mode": args.mode,
        "seconds": round(t, 4),
        "tflops": round(flops / t / 1e12, 1),
        "note": note,
    }
    print(row)
    append_csv(args.out, row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
