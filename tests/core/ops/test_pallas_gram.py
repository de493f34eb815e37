"""Pallas gram kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest


def test_gram_matches_numpy(app_inst):
    from nums_tpu.core.ops import pallas_gram

    rs = np.random.RandomState(0)
    x = rs.randn(1024, 128).astype(np.float32)
    assert pallas_gram.supported(x.shape, x.dtype)
    import jax.numpy as jnp

    g = np.asarray(pallas_gram.gram(jnp.asarray(x)))
    assert np.allclose(g, x.T @ x, atol=1e-2)
    # relative error small
    rel = np.max(np.abs(g - x.T @ x)) / np.max(np.abs(x.T @ x))
    assert rel < 1e-5


def test_gram_ragged_rows(app_inst):
    from nums_tpu.core.ops import pallas_gram
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    x = rs.randn(1000, 128).astype(np.float32)  # not tile-aligned
    if not pallas_gram.supported(x.shape, x.dtype):
        pytest.skip("below tile threshold")
    g = np.asarray(pallas_gram.gram(jnp.asarray(x)))
    rel = np.max(np.abs(g - x.T @ x)) / np.max(np.abs(x.T @ x))
    assert rel < 1e-5


def test_gram_unsupported_shapes(app_inst):
    from nums_tpu.core.ops import pallas_gram

    assert not pallas_gram.supported((100,), np.float32)
    assert not pallas_gram.supported((10000, 8192), np.float32)
    assert not pallas_gram.supported((10000, 128), np.float64)


def test_env_dispatch(app_inst, monkeypatch):
    """NUMS_TPU_PALLAS_GRAM=1 routes x.T @ x through the kernel."""
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")
    rs = np.random.RandomState(2)
    x = rs.randn(2048, 128).astype(np.float32)
    bx = app_inst.array(x, block_shape=(512, 128))
    g = (bx.T @ bx).get()
    rel = np.max(np.abs(g - x.T @ x)) / np.max(np.abs(x.T @ x))
    assert rel < 1e-5