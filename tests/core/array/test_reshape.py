"""Reshape engine oracle tests (parity: reference test_reshape.py)."""

import numpy as np
import pytest


def test_simple_reshape(app_inst):
    x = np.arange(24).astype(float)
    bx = app_inst.array(x, block_shape=(6,))
    assert np.allclose(bx.reshape(4, 6).get(), x.reshape(4, 6))
    assert np.allclose(bx.reshape((2, 3, 4)).get(), x.reshape(2, 3, 4))
    assert np.allclose(bx.reshape(-1, 8).get(), x.reshape(-1, 8))
    assert np.allclose(bx.reshape(24).get(), x)


def test_reblock_only(app_inst):
    rs = np.random.RandomState(0)
    x = rs.randn(16, 8)
    bx = app_inst.array(x, block_shape=(4, 8))
    rb = bx.reshape(block_shape=(8, 4))
    assert rb.shape == (16, 8)
    assert rb.block_shape == (8, 4)
    assert np.allclose(rb.get(), x)


def test_arbitrary_reshape(app_inst):
    rs = np.random.RandomState(1)
    x = rs.randn(12, 10)
    bx = app_inst.array(x, block_shape=(5, 3))
    y = bx.reshape(10, 12, block_shape=(4, 7))
    assert np.allclose(y.get(), x.reshape(10, 12))
    assert y.block_shape == (4, 7)
    z = bx.reshape(3, 5, 8, block_shape=(2, 2, 2))
    assert np.allclose(z.get(), x.reshape(3, 5, 8))


def test_reshape_errors(app_inst):
    x = app_inst.array(np.arange(10), block_shape=(5,))
    with pytest.raises(ValueError):
        x.reshape(3, 4)
    with pytest.raises(ValueError):
        x.reshape(-1, -1)


def test_reshape_size_zero_matches_numpy(app_inst):
    """Review regression: size-0 arrays follow numpy reshape rules —
    a nonzero-size target raises ValueError up front (not a deep jax
    trace error), while 0-size targets succeed."""
    import pytest as _pytest

    b = app_inst.array(np.zeros((0,)), block_shape=(1,))
    with _pytest.raises(ValueError, match="cannot reshape"):
        b.reshape((3, 4))
    assert b.reshape((0, 4)).shape == (0, 4)
    assert b.reshape((-1, 5)).shape == (0, 5)
