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
