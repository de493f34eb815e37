"""Oracle tests for creation/index/window/poly functions moved from
host-constant fallbacks to on-device builders (round 3)."""

import numpy as np

import nums_tpu.numpy as nps


def test_tri_oracle(nps_app_inst):
    assert np.allclose(nps.tri(4, 6, 1).get(), np.tri(4, 6, 1))
    assert np.allclose(nps.tri(3).get(), np.tri(3))


def test_index_builders_oracle(nps_app_inst):
    cases = [
        (nps.tril_indices(5, 1), np.tril_indices(5, 1)),
        (nps.triu_indices(5, -1, 7), np.triu_indices(5, -1, 7)),
        (nps.diag_indices(4), np.diag_indices(4)),
        (nps.diag_indices(3, 3), np.diag_indices(3, 3)),
    ]
    for ours, ref in cases:
        assert len(ours) == len(ref)
        for o, r in zip(ours, ref):
            assert np.array_equal(o.get(), r)
    assert np.array_equal(nps.indices((3, 4)).get(), np.indices((3, 4)))
    # index builders must be USABLE as indices into BlockArrays
    a = np.arange(25.0).reshape(5, 5)
    ba = nps.array(a)
    rows, cols = nps.tril_indices(5)
    assert np.allclose(ba[rows, cols].get(), a[np.tril_indices(5)])


def test_windows_oracle(nps_app_inst):
    for w in ("hamming", "hanning", "blackman", "bartlett"):
        assert np.allclose(
            getattr(nps, w)(12).get(), getattr(np, w)(12)
        ), w
    assert np.allclose(nps.kaiser(10, 8.6).get(), np.kaiser(10, 8.6))


def test_sort_complex_poly_oracle(nps_app_inst):
    z = np.array([3 + 1j, 1 - 2j, 2 + 0j])
    assert np.allclose(
        nps.sort_complex(nps.array(z)).get(), np.sort_complex(z)
    )
    rts = np.array([1.0, 2.0, 3.0])
    assert np.allclose(nps.poly(nps.array(rts)).get(), np.poly(rts))
    m2 = np.array([[1.0, 2.0], [3.0, 4.0]])  # 2-D: host eig fallback
    assert np.allclose(nps.poly(nps.array(m2)).get(), np.poly(m2))


def test_real_if_close_oracle(nps_app_inst):
    c = np.array([1 + 1e-14j, 2 + 0j])
    o = nps.real_if_close(nps.array(c)).get()
    assert o.dtype.kind == "f" and np.allclose(o, [1, 2])
    c2 = np.array([1 + 1j, 2 + 0j])
    assert nps.real_if_close(nps.array(c2)).get().dtype.kind == "c"
    r = np.array([1.0, 2.0])  # real input passes through
    assert nps.real_if_close(nps.array(r)).get().dtype.kind == "f"


def test_multinomial_device(nps_app_inst):
    out = nps.random.multinomial(100, [0.2, 0.3, 0.5])
    got = out.get()
    assert got.shape == (3,) and got.sum() == 100
    out2 = nps.random.multinomial(50, [0.5, 0.5], size=4)
    got2 = out2.get()
    assert got2.shape == (4, 2) and (got2.sum(axis=1) == 50).all()
    # counter-based determinism: same seed, same draws
    import nums_tpu.numpy.random as nr

    a = nr.RandomState(9).multinomial(30, [0.1, 0.9]).get()
    b = nr.RandomState(9).multinomial(30, [0.1, 0.9]).get()
    assert np.array_equal(a, b)


def test_insert_oracle(nps_app_inst):
    a = np.arange(12.0).reshape(3, 4)
    ba = nps.array(a)
    assert np.allclose(
        nps.insert(ba, 1, 99.0, axis=0).get(), np.insert(a, 1, 99.0, axis=0)
    )
    assert np.allclose(
        nps.insert(ba, slice(1, 3), 7.0, axis=1).get(),
        np.insert(a, slice(1, 3), 7.0, axis=1),
    )
    assert np.allclose(
        nps.insert(ba, [1, 3], 5.0, axis=1).get(),
        np.insert(a, [1, 3], 5.0, axis=1),
    )
    assert np.allclose(nps.insert(ba, 2, 1.5).get(), np.insert(a, 2, 1.5))
