"""On-hardware numerical smoke suite.

Runs the core op vocabulary on the REAL default backend (TPU when
attached) and checks against NumPy at fp32 tolerances. The pytest suite
forces CPU (deterministic, 8 virtual devices); this script is the
hardware tier: `python scripts/tpu_smoke.py` → prints PASS/FAIL lines.
"""

import sys

import numpy as np


def check(name, ours, expected, tol=1e-4):
    """Scaled max-error check: max|a-b| / max|b| <= tol."""
    expected = np.asarray(expected)
    scale = max(1e-12, float(np.max(np.abs(expected))))
    err = float(np.max(np.abs(np.asarray(ours) - expected))) / scale
    ok = err <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max rel err {err:.2e} "
          f"(tol {tol:.0e})")
    return ok


def main():
    import time

    sys.path.insert(0, ".")  # run as `python scripts/tpu_smoke.py`
    import nums_tpu
    import nums_tpu.numpy as nps
    from nums_tpu.models.glms import LogisticRegression
    from nums_tpu.core.io.datasets import BimodalGaussian

    # Bounded-time init (round 5): ensure_runtime_alive runs inside
    # init() — a wedged tunnel now errors within NUMS_TPU_INIT_TIMEOUT_S
    # instead of hanging; a healthy one must come up well under it.
    t_init = time.perf_counter()
    app = nums_tpu.init()
    t_init = time.perf_counter() - t_init
    from nums_tpu.core import settings as _settings

    # init_timeout_s == 0 disables the watchdog — no budget to enforce.
    init_ok = (_settings.init_timeout_s == 0
               or t_init < _settings.init_timeout_s)
    print(f"{'PASS' if init_ok else 'FAIL'} bounded init: "
          f"{t_init:.1f}s (watchdog budget {_settings.init_timeout_s}s)")
    print("backend:", app.backend.name, "devices:", app.backend.num_devices)

    rs = np.random.RandomState(0)
    ok = True
    ok &= init_ok

    x = rs.randn(4096, 256).astype(np.float32)
    y = rs.randn(256, 128).astype(np.float32)
    bx = app.array(x, block_shape=(1024, 256))
    by = app.array(y, block_shape=(256, 128))
    # Default matmul precision is the fast single-pass MXU path: expect
    # ~bf16-mantissa relative error (documented in settings.py).
    ok &= check("matmul (default precision)", (bx @ by).get(), x @ y,
                tol=5e-3)
    ok &= check("gram x.T@x (default precision)", (bx.T @ bx).get(),
                x.T @ x, tol=5e-3)
    # Full-precision path must be fp32-accurate.
    import jax
    import jax.numpy as jnp

    hi = jax.jit(
        lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
    )
    ok &= check("matmul (highest precision)", np.asarray(hi(bx.data, by.data)),
                x @ y, tol=1e-5)
    ok &= check("elementwise chain", (nps.exp(bx * 0.01) + 1).get(),
                np.exp(x * 0.01) + 1, tol=1e-5)
    ok &= check("sum axis0", bx.sum(axis=0).get(), x.sum(axis=0), tol=1e-5)
    ok &= check("mean/std", float(app.std(bx)), x.std(), tol=1e-5)

    q, r = app.direct_tsqr(bx)
    # Reconstruction multiply on host at fp64; Q@R itself carries the
    # default-precision matmul error of the Q = X R^-1 products.
    ok &= check("tsqr reconstruct", q.get().astype(np.float64)
                @ r.get().astype(np.float64), x, tol=5e-3)
    ok &= check("tsqr orthogonality", q.get().T @ q.get(), np.eye(256),
                tol=1e-4)
    u, s, vt = app.svd(bx)
    ok &= check("svd singular values", np.sort(s.get()),
                np.sort(np.linalg.svd(x, compute_uv=False)), tol=1e-3)

    spd = (x.T @ x + 256 * np.eye(256)).astype(np.float32)
    bspd = app.array(spd, block_shape=(256, 256))
    ok &= check("cholesky", app.cholesky(bspd).get(),
                np.linalg.cholesky(spd), tol=1e-4)

    # GLM end-to-end
    real_X, real_y = BimodalGaussian.get_dataset(5000, 10)
    X = app.array(real_X.astype(np.float32), block_shape=(1250, 10))
    yb = app.array(real_y.astype(np.float32), block_shape=(1250,))
    model = LogisticRegression(solver="newton", tol=1e-6, max_iter=10)
    model.fit(X, yb)
    acc = float(np.mean(model.predict(X).get() == real_y))
    print(f"{'PASS' if acc > 0.95 else 'FAIL'} GLM newton accuracy: {acc}")
    ok &= acc > 0.95

    # ADMM lasso: exact support recovery on hardware (fp32 prox loop).
    Xl = rs.randn(8000, 12).astype(np.float32)
    theta = np.zeros(12, np.float32)
    theta[[1, 5, 9]] = [2.0, -1.0, 3.0]
    yl = (Xl @ theta + 0.01 * rs.randn(8000)).astype(np.float32)
    from nums_tpu.models.glms import LinearRegression

    lasso = LinearRegression(
        solver="admm", penalty="l1", C=1.0 / 200.0, tol=1e-5, max_iter=500
    )
    lasso.fit(app.array(Xl, block_shape=(2000, 12)),
              app.array(yl, block_shape=(2000,)))
    beta = lasso._beta.get()
    support = set(np.flatnonzero(np.abs(beta) > 1e-8).tolist())
    sup_ok = support == {1, 5, 9}
    print(f"{'PASS' if sup_ok else 'FAIL'} ADMM lasso support: {support}")
    ok &= sup_ok

    # RNG moments
    sample = app.random_state(7).normal(
        loc=2.0, scale=3.0, shape=(100000,), block_shape=(100000,),
        dtype=np.float32,
    ).get()
    ok &= check("rng normal moments", [sample.mean(), sample.std()],
                [2.0, 3.0], tol=2e-2)

    # Out-of-core path: spill → streamed gram + logistic fit (small:
    # bulk host↔device transfer is MB/s-scale through tunneled
    # transports; this checks correctness, not throughput).
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        xo = rs.randn(4000, 50).astype(np.float32)
        Xo = app.array(xo, block_shape=(1000, 50))
        dX = app.spill(Xo, td + "/oocX")
        ok &= check("ooc streamed gram", app.gram_ooc(dX).get(),
                    xo.T @ xo, tol=5e-3)
        yo = (xo[:, 0] > 0).astype(np.float64)
        mo = LogisticRegression(solver="newton", max_iter=5, tol=1e-8)
        mo.fit(dX, yo)
        acc_o = float(np.mean(mo.predict(Xo).get() == yo))
        print(f"{'PASS' if acc_o > 0.95 else 'FAIL'} "
              f"ooc logistic fit acc: {acc_o}")
        ok &= acc_o > 0.95

    # OOC donation (round 5): the streamed fold donates its accumulator
    # and panel buffers — steady-state HBM must not grow run-over-run.
    # memory_stats is unavailable on some PJRT plugins — skip cleanly.
    try:
        dev = jax.local_devices()[0]
        stats0 = dev.memory_stats() or {}
    except Exception:
        stats0 = {}
    if "bytes_in_use" in stats0:
        with tempfile.TemporaryDirectory() as td2:
            xo2 = rs.randn(32_000, 128).astype(np.float32)
            dX2 = app.spill(app.array(xo2, block_shape=(4000, 128)),
                            td2 + "/don")
            app.gram_ooc(dX2).get()  # compile + first stream
            before = dev.memory_stats()["bytes_in_use"]
            app.gram_ooc(dX2).get()
            growth = dev.memory_stats()["bytes_in_use"] - before
            don_ok = growth < 16 * 1024 * 1024
            print(f"{'PASS' if don_ok else 'FAIL'} ooc donation: HBM "
                  f"growth {growth / 1e6:.1f} MB across a full re-run")
            ok &= don_ok
    else:
        print("SKIP ooc donation HBM check (memory_stats unavailable)")

    # Device-side dynamic-shape family (round 3): the capacity idiom
    # (count sync + jnp.nonzero/jnp.unique with static size) must work
    # on the REAL TPU, not just the CPU test tier.
    xi = rs.randint(0, 9, size=2048).astype(np.float32)
    bi = app.array(xi, block_shape=(512,))
    ok &= check("device unique", nps.unique(bi).get(), np.unique(xi),
                tol=0.0)
    vals, counts = nps.unique(bi, return_counts=True)
    ok &= check("device unique counts", counts.get(),
                np.unique(xi, return_counts=True)[1], tol=0.0)
    other = np.array([2.0, 5.0, 11.0], np.float32)
    ok &= check("device intersect1d",
                nps.intersect1d(bi, nps.array(other)).get(),
                np.intersect1d(xi, other), tol=0.0)
    mask = xi > 4
    ok &= check("device extract",
                nps.extract(app.array(mask, block_shape=(512,)), bi).get(),
                np.extract(mask, xi), tol=0.0)
    packed = bi.copy()
    fillv = np.arange(mask.sum(), dtype=np.float32)
    packed[app.array(mask, block_shape=(512,))] = app.array(
        fillv, block_shape=(int(mask.sum()),)
    )
    want_packed = xi.copy()
    want_packed[mask] = fillv
    ok &= check("device packed-mask setitem", packed.get(), want_packed,
                tol=0.0)

    # Autodiff on hardware: gradient of a least-squares chain.
    from nums_tpu import autodiff

    xa = rs.randn(2000, 20).astype(np.float32)
    ya = rs.randn(2000).astype(np.float32)
    ba = rs.randn(20).astype(np.float32)
    Xa_ = app.array(xa, block_shape=(500, 20))
    ya_ = app.array(ya, block_shape=(500,))
    ba_ = app.array(ba, block_shape=(20,))

    def lsq(b):
        r = Xa_ @ b - ya_
        return (r * r).sum()

    _, g = autodiff.value_and_grad(lsq)(ba_)
    ok &= check("autodiff lsq gradient", g.get(),
                2.0 * xa.T @ (xa @ ba - ya), tol=5e-3)

    # Symmetric Pallas gram (round 4): default-on for lane-aligned d on
    # TPU; bf16-class accuracy, exactly symmetric output.
    from nums_tpu.core.ops import pallas_gram

    # Auto-gating must be ON here (the whole point of the hardware
    # tier): tpu/axon backend + default matmul precision.
    auto_on = pallas_gram.enabled()
    on_tpu = jax.default_backend() in ("tpu", "axon")
    gate_ok = auto_on == on_tpu
    print(f"{'PASS' if gate_ok else 'FAIL'} pallas auto-gate "
          f"(backend={jax.default_backend()}, enabled={auto_on})")
    ok &= gate_ok

    xp = rs.randn(120_000, 256).astype(np.float32)
    if pallas_gram.enabled() and pallas_gram.supported(xp.shape, xp.dtype):
        import jax.numpy as _jnp

        # NON-interpret compile: on tpu/axon the pallas_call lowers via
        # Mosaic (interpret only on cpu backends) — a compile failure
        # here is the signal the smoke tier exists to catch.
        interp = jax.default_backend() == "cpu"
        print(f"{'PASS' if not interp else 'FAIL'} pallas non-interpret "
              f"compile path (interpret={interp})")
        ok &= not interp
        gp = np.asarray(pallas_gram.gram(_jnp.asarray(xp)))
        ok &= check("pallas symmetric gram", gp, xp.T @ xp, tol=2e-3)
        sym = bool(np.array_equal(gp, gp.T))
        ok &= sym
        print(f"{'PASS' if sym else 'FAIL'} pallas gram exact symmetry")
        # Weighted gram: the Hessian scale fused in-kernel (round 5)
        # against the float64 host oracle.
        sp = (np.abs(np.sin(np.arange(120_000))) + 0.01).astype(
            np.float32
        )
        gw = np.asarray(
            pallas_gram.gram(_jnp.asarray(xp), _jnp.asarray(sp))
        )
        ok &= check(
            "pallas weighted gram (fused scale)", gw,
            (xp.astype(np.float64) * sp[:, None].astype(np.float64)).T
            @ xp.astype(np.float64), tol=2e-3,
        )
    else:
        print("SKIP pallas gram (not enabled/supported on this backend)")

    # Fused one-pass Newton stats (round 5): eta + g + weighted H from
    # a single HBM read — non-interpret Mosaic compile of the matvec
    # contractions and the in-VMEM link chain is exactly what this tier
    # must prove before the lr benchmarks lean on the route.
    from nums_tpu.core.ops import pallas_newton

    xn = rs.randn(120_000, 256).astype(np.float32) * 0.1
    if pallas_newton.enabled() and pallas_newton.supported(
        xn.shape, xn.dtype
    ):
        import jax.numpy as _jnp

        yn = (rs.rand(120_000) > 0.5).astype(np.float32)
        bn = (rs.randn(256) * 0.05).astype(np.float32)
        gn, hn = pallas_newton.stats(
            _jnp.asarray(xn), _jnp.asarray(yn), _jnp.asarray(bn),
            "logistic",
        )
        eta64 = xn.astype(np.float64) @ bn.astype(np.float64)
        mu64 = 1.0 / (1.0 + np.exp(-eta64))
        s64 = mu64 * (1.0 - mu64)
        ok &= check("pallas fused newton g", np.asarray(gn),
                    xn.T.astype(np.float64) @ (mu64 - yn), tol=4e-3)
        ok &= check("pallas fused newton H", np.asarray(hn),
                    (xn.astype(np.float64) * s64[:, None]).T
                    @ xn.astype(np.float64), tol=4e-3)
    else:
        print("SKIP pallas fused newton (not enabled/supported here)")

    # Collective-matmul dispatch on ONE chip: choose_schedule must
    # decline cleanly (no mesh axes to ride), leaving XLA's path.
    from nums_tpu.core.ops import summa

    if app.backend.mesh is None or app.backend.num_devices == 1:
        summa.LAST_DISPATCH = None
        xs = rs.randn(512, 256).astype(np.float32)
        bs = app.array(xs, block_shape=(256, 256))
        ok &= check("single-chip tensordot (summa declines)",
                    (bs.T @ bs).get(), xs.T @ xs, tol=5e-3)
        declined = summa.LAST_DISPATCH in (None, "xla")
        print(f"{'PASS' if declined else 'FAIL'} summa declines on one "
              f"chip (LAST_DISPATCH={summa.LAST_DISPATCH})")
        ok &= declined

    # At-rest lane padding route (round 4, what bench.py runs): a
    # (n, 1000) BlockArray stored as (n, 1024) with zero pads — x.T@x
    # must dispatch the symmetric kernel on the PHYSICAL buffer and
    # match the logical oracle.
    if pallas_gram.enabled():
        from nums_tpu.core import application_manager, settings

        settings.lane_pad, settings.lane_pad_min = True, 512
        application_manager.destroy()
        app_lp = application_manager.create()
        try:
            xq = rs.randn(20_000, 1000).astype(np.float32)
            bq = app_lp.array(xq, block_shape=(10_000, 1000))
            padded = tuple(bq.raw.shape) == (20_000, 1024)
            print(f"{'PASS' if padded else 'FAIL'} lane-padded at-rest "
                  f"buffer (raw {tuple(bq.raw.shape)})")
            ok &= padded
            ok &= check("lane-padded gram route (physical-buffer kernel)",
                        (bq.T @ bq).get(), xq.T @ xq, tol=5e-3)
        finally:
            settings.lane_pad = False
            application_manager.destroy()
            application_manager.create()
    else:
        print("SKIP lane-padded gram route (pallas disabled here)")

    print("OVERALL:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
