"""Creation/manipulation sweep (parity: reference
tests/numpy/test_creation_manipulation.py)."""

import itertools

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


import nums_tpu.numpy as nps  # noqa: E402


def test_creation_dtypes_sweep():
    shapes = [(7,), (3, 4), (2, 3, 2)]
    dtypes = [np.float64, np.float32, np.int64, np.int32, bool]
    for shape, dtype in itertools.product(shapes, dtypes):
        for name in ("zeros", "ones"):
            ours = getattr(nps, name)(shape, dtype=dtype)
            expected = getattr(np, name)(shape, dtype=dtype)
            assert ours.shape == expected.shape
            assert ours.dtype == expected.dtype, (name, shape, dtype)
            assert np.array_equal(ours.get(), expected)


def test_like_constructors_sweep():
    proto = nps.array(np.arange(12.0).reshape(3, 4))
    for name in ("zeros_like", "ones_like", "empty_like"):
        ours = getattr(nps, name)(proto)
        assert ours.shape == (3, 4)
        assert ours.dtype == np.float64
        # dtype and shape overrides
        o2 = getattr(nps, name)(proto, dtype=np.int32, shape=(6, 2))
        assert o2.shape == (6, 2) and o2.dtype == np.int32
    fl = nps.full_like(proto, 3.0)
    assert np.allclose(fl.get(), np.full((3, 4), 3.0))


def test_eye_identity_diag_sweep():
    for n, m, k in [(4, 4, 0), (3, 5, 0), (5, 3, 0), (4, 4, 1), (4, 6, -2)]:
        assert np.array_equal(nps.eye(n, m, k=k).get(), np.eye(n, m, k=k))
    assert np.array_equal(nps.identity(6).get(), np.identity(6))
    v = np.arange(5.0)
    m = nps.diag(nps.array(v))
    assert np.array_equal(m.get(), np.diag(v))
    assert np.array_equal(nps.diag(m).get(), v)


def test_arange_variants():
    assert np.array_equal(nps.arange(7).get(), np.arange(7))
    assert np.array_equal(nps.arange(2, 9).get(), np.arange(2, 9))
    a = nps.arange(5, dtype=np.float64)
    assert a.dtype == np.float64
    assert np.array_equal(a.get(), np.arange(5, dtype=np.float64))
    # float bounds
    assert np.array_equal(nps.arange(0.0, 4.0).get(), np.arange(0.0, 4.0))


def test_reshape_block_shape_interface():
    x_np = np.arange(24.0)
    x = nps.array(x_np)
    for shape in [(24,), (4, 6), (2, 3, 4), (6, 4)]:
        y = nps.reshape(x, shape)
        assert y.shape == shape
        assert np.allclose(y.get(), x_np.reshape(shape))
    # method form with explicit block shape
    z = x.reshape(4, 6, block_shape=(2, 3))
    assert z.block_shape == (2, 3)
    assert z.grid.grid_shape == (2, 2)