"""ndarray-style method surface on BlockArray (drop-in ergonomics)."""

import numpy as np


def test_methods_match_numpy(app_inst):
    rs = np.random.RandomState(0)
    x = rs.randn(6, 8)
    b = app_inst.array(x, block_shape=(3, 4))
    assert bool(b.all()) == bool(x.all())
    assert bool((b > 0).any()) == bool((x > 0).any())
    assert np.allclose(b.clip(-1, 1).get(), x.clip(-1, 1))
    assert np.allclose(b.round(1).get(), x.round(1))
    assert np.allclose(b.cumsum(axis=0).get(), x.cumsum(axis=0))
    assert np.allclose(b.cumprod(axis=1).get(), x.cumprod(axis=1))
    assert np.allclose(b.take(app_inst.array(np.array([1, 3]), (2,)),
                              axis=1).get(), x.take([1, 3], axis=1))
    assert np.allclose(b.repeat(2, axis=0).get(), x.repeat(2, axis=0))
    assert np.allclose(b.ravel().get(), x.ravel())
    assert np.allclose(b.flatten().get(), x.flatten())
    assert np.allclose(b.swapaxes(0, 1).get(), x.swapaxes(0, 1))
    assert np.array_equal(b.argsort(axis=1).get(), x.argsort(axis=1))
    assert np.allclose(b.dot(app_inst.array(x.T, (4, 3))).get(), x.dot(x.T))
    assert np.allclose(float(b.trace()), x.trace())
    assert np.allclose(b.diagonal().get(), x.diagonal())
    v = b[0, :3]
    nz = (v > 100).nonzero()
    assert nz[0].shape == (0,)
    assert float(app_inst.scalar(2.5).item()) == 2.5
    assert b.tolist() == x.tolist()
    z = app_inst.array(np.array([1 + 2j, 3 - 1j]), (2,))
    assert np.allclose(z.conj().get(), np.conj([1 + 2j, 3 - 1j]))
    assert np.allclose(z.real.get(), [1.0, 3.0])
    assert np.allclose(z.imag.get(), [2.0, -1.0])
    # in-place sort rebind
    s = app_inst.array(x[0].copy(), (4,))
    s.sort()
    assert np.allclose(s.get(), np.sort(x[0]))


def test_array_protocol(app_inst):
    x_np = np.arange(6.0).reshape(2, 3)
    b = app_inst.array(x_np, block_shape=(2, 3))
    assert np.allclose(np.asarray(b), x_np)
    assert np.asarray(b, dtype=np.float32).dtype == np.float32
    # reflected numpy-scalar ops still route through our operators
    out = np.float64(2.0) * b
    from nums_tpu.core.array.blockarray import BlockArray
    assert isinstance(out, BlockArray)
    assert np.allclose(out.get(), 2.0 * x_np)
    # lazy transpose fetches correctly through the protocol
    assert np.allclose(np.asarray(b.T), x_np.T)


def test_eq_none_is_elementwise_bool(app_inst):
    """Review regression: ba == None / ba != None follow np.ndarray
    semantics (elementwise False/True), not a ValueError."""
    x = np.arange(6.0).reshape(2, 3)
    b = app_inst.array(x, block_shape=(2, 3))
    eq = (b == None).get()  # noqa: E711 — the operator IS the subject
    ne = (b != None).get()  # noqa: E711
    assert eq.dtype == np.bool_ and eq.shape == x.shape and not eq.any()
    assert ne.dtype == np.bool_ and ne.shape == x.shape and ne.all()
