"""Dtype coverage: complex, integer, bool arithmetic + promotion."""

import numpy as np


def test_complex_support(app_inst):
    z = np.array([1 + 2j, 3 - 1j, -2 + 0.5j])
    bz = app_inst.array(z, block_shape=(3,))
    assert bz.dtype == np.complex128
    assert np.allclose((bz * bz).get(), z * z)
    assert np.allclose(app_inst.abs(bz).get(), np.abs(z))
    assert np.allclose(app_inst.map_uop("conj", bz).get(), np.conj(z))
    assert np.allclose(bz.sum().get(), z.sum())
    m = np.array([[1 + 1j, 2], [3, 4 - 2j]])
    bm = app_inst.array(m, block_shape=(2, 2))
    assert np.allclose((bm @ bm).get(), m @ m)
    assert np.allclose(bm.T.get(), m.T)  # transpose (not conjugate)


def test_promotion_matches_numpy(app_inst):
    cases = [
        (np.int32, np.int64),
        (np.float32, np.float64),
        (np.bool_, np.int32),
        (np.float32, np.complex64),
    ]
    for dt1, dt2 in cases:
        a = np.ones(4, dtype=dt1)
        b = np.ones(4, dtype=dt2)
        ba = app_inst.array(a, block_shape=(4,))
        bb = app_inst.array(b, block_shape=(4,))
        out = (ba + bb).get()
        assert out.dtype == (a + b).dtype, (dt1, dt2, out.dtype)
    # Documented divergence: int64 + float32 gives float32 under jax's
    # promotion rules (NumPy would upcast to float64).
    a = np.ones(4, dtype=np.int64)
    b = np.ones(4, dtype=np.float32)
    out = (
        app_inst.array(a, block_shape=(4,))
        + app_inst.array(b, block_shape=(4,))
    ).get()
    assert out.dtype == np.float32


def test_weak_scalar_promotion(app_inst):
    # Python scalars must not upcast arrays (NumPy value-based semantics).
    a = np.ones(4, dtype=np.float32)
    ba = app_inst.array(a, block_shape=(4,))
    assert (ba + 1).dtype == np.float32
    assert (ba * 2.5).dtype == np.float32
    ai = np.ones(4, dtype=np.int32)
    bi = app_inst.array(ai, block_shape=(4,))
    assert (bi + 1).dtype == np.int32


def test_int_matmul(app_inst):
    a = np.arange(12, dtype=np.int64).reshape(3, 4)
    b = np.arange(8, dtype=np.int64).reshape(4, 2)
    ba = app_inst.array(a, block_shape=(3, 2))
    bb = app_inst.array(b, block_shape=(2, 2))
    out = (ba @ bb).get()
    assert out.dtype == np.int64
    assert np.array_equal(out, a @ b)


def test_grid_dtype_reflects_actual_device_dtype(app_inst):
    """Advisor regression: with x64 off the device downcasts 64→32-bit;
    grid metadata must report the ACTUAL on-device dtype so a.dtype,
    checkpoint meta and a.get().dtype agree."""
    import jax

    try:
        jax.config.update("jax_enable_x64", False)
        x = app_inst.array(np.arange(6, dtype=np.float64), block_shape=(3,))
        assert x.dtype == x.get().dtype
        assert x.grid.dtype == x.data.dtype.name
    finally:
        jax.config.update("jax_enable_x64", True)


def test_reduction_dtype_is_accumulator_dtype(app_inst):
    """Review regression: sum(int32, dtype=int64) must ACCUMULATE in
    int64 (numpy semantics), not cast after an overflowing int32
    reduction."""
    n = 100_000
    a = np.full(n, 2**16, dtype=np.int32)
    ba = app_inst.array(a, block_shape=(n // 4,))
    out = app_inst.sum(ba, dtype=np.int64)
    assert out.dtype == np.int64
    assert int(out.get()) == n * 2**16  # wraps to 0 if accumulated int32
    # float32 -> float64 accumulation keeps the requested precision path
    f = np.ones(10, dtype=np.float32)
    bf = app_inst.array(f, block_shape=(5,))
    assert app_inst.mean(bf, dtype=np.float64).dtype == np.float64
    assert app_inst.var(bf, dtype=np.float64).dtype == np.float64
    assert app_inst.std(bf, dtype=np.float64).dtype == np.float64
