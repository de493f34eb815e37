"""Extended numpy-surface oracle tests (nums_tpu.numpy.extra)."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


import nums_tpu.numpy as nps  # noqa: E402


def test_reductions_scans():
    rs = np.random.RandomState(0)
    x_np = rs.randn(8, 6)
    x = nps.array(x_np)
    assert np.allclose(nps.prod(x, axis=0).get(), x_np.prod(axis=0))
    assert bool(nps.all(x < 100))
    assert not bool(nps.all(x > 0))
    assert bool(nps.any(x > 0))
    assert np.allclose(nps.cumsum(x, axis=1).get(), x_np.cumsum(axis=1))
    assert np.allclose(nps.cumprod(x, axis=0).get(), x_np.cumprod(axis=0))
    assert np.allclose(nps.median(x).get(), np.median(x_np))
    assert np.allclose(float(nps.ptp(x)), np.ptp(x_np))
    assert int(nps.count_nonzero(x > 0)) == np.count_nonzero(x_np > 0)
    xn = x_np.copy()
    xn[0, 0] = np.nan
    bn = nps.array(xn)
    assert np.allclose(nps.nansum(bn).get(), np.nansum(xn))
    assert np.allclose(nps.nanmean(bn, axis=0).get(), np.nanmean(xn, axis=0))
    assert np.allclose(nps.nanmax(bn).get(), np.nanmax(xn))
    w = np.abs(rs.randn(8)) + 0.1
    assert np.allclose(
        nps.average(x, axis=0, weights=nps.array(w)).get(),
        np.average(x_np, axis=0, weights=w),
    )


def test_rounding_clipping():
    x_np = np.array([-2.7, -0.5, 0.49, 1.51, 9.9])
    x = nps.array(x_np)
    assert np.allclose(nps.clip(x, -1, 1).get(), np.clip(x_np, -1, 1))
    assert np.allclose(nps.around(x, 0).get(), np.around(x_np, 0))
    assert np.allclose(nps.round(x, 1).get(), np.round(x_np, 1))


def test_sorting_searching():
    rs = np.random.RandomState(1)
    x_np = rs.randn(50)
    x = nps.array(x_np)
    assert np.allclose(nps.sort(x).get(), np.sort(x_np))
    assert np.array_equal(nps.argsort(x).get(), np.argsort(x_np))
    sorted_x = nps.sort(x)
    v = nps.array(np.array([-0.5, 0.0, 0.5]))
    assert np.array_equal(
        nps.searchsorted(sorted_x, v).get(),
        np.searchsorted(np.sort(x_np), [-0.5, 0.0, 0.5]),
    )
    idx = nps.array(np.array([4, 2, 0]))
    assert np.allclose(nps.take(x, idx).get(), x_np[[4, 2, 0]])


def test_stacking_shaping():
    rs = np.random.RandomState(2)
    a_np, b_np = rs.randn(3, 4), rs.randn(3, 4)
    a, b = nps.array(a_np), nps.array(b_np)
    assert np.allclose(nps.stack([a, b]).get(), np.stack([a_np, b_np]))
    assert np.allclose(nps.vstack([a, b]).get(), np.vstack([a_np, b_np]))
    assert np.allclose(nps.hstack([a, b]).get(), np.hstack([a_np, b_np]))
    assert np.allclose(
        nps.column_stack([a[:, 0], b[:, 0]]).get(),
        np.column_stack([a_np[:, 0], b_np[:, 0]]),
    )
    assert np.allclose(nps.tile(a, (2, 1)).get(), np.tile(a_np, (2, 1)))
    assert np.allclose(nps.repeat(a, 3, axis=0).get(),
                       np.repeat(a_np, 3, axis=0))
    assert np.allclose(nps.roll(a, 1, axis=1).get(), np.roll(a_np, 1, axis=1))
    assert np.allclose(nps.flip(a).get(), np.flip(a_np))
    assert np.allclose(nps.fliplr(a).get(), np.fliplr(a_np))
    assert np.allclose(nps.ravel(a).get(), a_np.ravel())
    assert np.allclose(nps.swapaxes(a, 0, 1).get(), a_np.swapaxes(0, 1))
    assert np.allclose(
        nps.broadcast_to(a[0], (5, 4)).get(), np.broadcast_to(a_np[0], (5, 4))
    )
    assert np.allclose(nps.triu(a).get(), np.triu(a_np))
    assert np.allclose(nps.tril(a, -1).get(), np.tril(a_np, -1))
    assert nps.atleast_2d(nps.array(np.arange(3))).shape == (1, 3)


def test_contractions():
    rs = np.random.RandomState(3)
    a_np, b_np = rs.randn(4, 5), rs.randn(5, 3)
    a, b = nps.array(a_np), nps.array(b_np)
    assert np.allclose(nps.dot(a, b).get(), a_np @ b_np)
    v_np = rs.randn(5)
    v = nps.array(v_np)
    assert np.allclose(nps.dot(a, v).get(), a_np @ v_np)
    assert np.allclose(float(nps.vdot(v, v)), v_np @ v_np)
    assert np.allclose(nps.inner(a, nps.array(rs.randn(2, 5))).get().shape,
                       (4, 2))
    assert np.allclose(nps.outer(v, v).get(), np.outer(v_np, v_np))
    assert np.allclose(float(nps.trace(a)), np.trace(a_np))
    assert np.allclose(
        nps.einsum("ij,jk->ik", a, b).get(), np.einsum("ij,jk->ik", a_np, b_np)
    )
    assert np.allclose(nps.kron(v, v).get(), np.kron(v_np, v_np))


def test_predicates_misc():
    rs = np.random.RandomState(4)
    x_np = rs.randn(10)
    x = nps.array(x_np)
    assert np.array_equal(
        nps.isclose(x, x + 1e-9).get(), np.isclose(x_np, x_np + 1e-9)
    )
    assert bool(nps.array_equal(x, x))
    assert not bool(nps.array_equal(x, x + 1))
    assert np.allclose(nps.real(x).get(), x_np)
    xn = x_np.copy()
    xn[3] = np.nan
    assert np.allclose(
        nps.nan_to_num(nps.array(xn)).get(), np.nan_to_num(xn)
    )
    assert np.allclose(nps.diff(x).get(), np.diff(x_np))
    u = nps.unique(nps.array(np.array([3, 1, 3, 2, 1])))
    assert np.array_equal(u.get(), [1, 2, 3])


def test_fft_nd_and_linalg_extras():
    rs = np.random.RandomState(7)
    x_np = rs.randn(16, 8)
    x = nps.array(x_np)
    assert np.allclose(nps.fft.fft2(x).get(), np.fft.fft2(x_np))
    assert np.allclose(nps.fft.ifftn(nps.fft.fftn(x)).get().real, x_np)
    assert np.allclose(nps.fft.rfft2(x).get(), np.fft.rfft2(x_np))
    spd = x_np.T @ x_np + np.eye(8)
    a = nps.array(spd)
    assert np.allclose(float(nps.linalg.cond(a)), np.linalg.cond(spd))
    assert np.allclose(
        nps.linalg.matrix_power(a, 3).get(), np.linalg.matrix_power(spd, 3)
    )
    assert np.allclose(nps.linalg.svdvals(a).get(),
                       np.linalg.svd(spd, compute_uv=False), atol=1e-8)
    assert np.allclose(nps.linalg.diagonal(a).get(), np.diagonal(spd))
    assert np.allclose(float(nps.linalg.matrix_norm(a)),
                       np.linalg.norm(spd, "fro"))
    # legacy random aliases
    s = nps.random.sample(10)
    assert s.shape == (10,)
    ri = nps.random.random_integers(1, 5, size=(100,))
    vals = ri.get()
    assert vals.min() >= 1 and vals.max() <= 5


def test_statistics_tranche():
    rs = np.random.RandomState(8)
    x_np = rs.randn(200)
    x = nps.array(x_np)
    assert np.allclose(float(nps.percentile(x, 50)), np.percentile(x_np, 50))
    assert np.allclose(
        nps.percentile(x, [25, 75]).get(), np.percentile(x_np, [25, 75])
    )
    assert np.allclose(float(nps.quantile(x, 0.9)), np.quantile(x_np, 0.9))
    h, e = nps.histogram(x, bins=10)
    h_np, e_np = np.histogram(x_np, bins=10)
    assert np.array_equal(h.get(), h_np)
    assert np.allclose(e.get(), e_np)
    m_np = rs.randn(4, 50)
    m = nps.array(m_np)
    assert np.allclose(nps.cov(m).get(), np.cov(m_np))
    assert np.allclose(nps.corrcoef(m).get(), np.corrcoef(m_np))
    xp = np.linspace(0, 10, 11)
    fp = xp ** 2
    xs = np.array([0.5, 3.3, 9.9])
    assert np.allclose(
        nps.interp(nps.array(xs), nps.array(xp), nps.array(fp)).get(),
        np.interp(xs, xp, fp),
    )
    a2 = nps.array(np.arange(6).reshape(2, 3).astype(float))
    assert np.allclose(
        nps.pad(a2, 1).get(), np.pad(np.arange(6).reshape(2, 3).astype(float), 1)
    )
    assert np.allclose(
        nps.pad(a2, ((1, 0), (0, 2))).get(),
        np.pad(np.arange(6).reshape(2, 3).astype(float), ((1, 0), (0, 2))),
    )
    ints = np.array([0, 1, 1, 3, 5, 5, 5])
    assert np.array_equal(
        nps.bincount(nps.array(ints)).get(), np.bincount(ints)
    )
    assert np.array_equal(
        nps.bincount(nps.array(ints), minlength=10).get(),
        np.bincount(ints, minlength=10),
    )
    mask2 = np.arange(10) % 3 == 0
    assert np.array_equal(
        nps.argwhere(nps.array(mask2)).get(), np.argwhere(mask2)
    )
    assert np.array_equal(
        nps.flatnonzero(nps.array(mask2)).get(), np.flatnonzero(mask2)
    )
    nz = nps.nonzero(nps.array(mask2))
    assert np.array_equal(nz[0].get(), np.nonzero(mask2)[0])


def test_signal_misc_tranche():
    rs = np.random.RandomState(9)
    x_np = rs.randn(20)
    v_np = rs.randn(5)
    x, v = nps.array(x_np), nps.array(v_np)
    assert np.allclose(nps.convolve(x, v).get(), np.convolve(x_np, v_np))
    assert np.allclose(
        nps.correlate(x, v, mode="valid").get(),
        np.correlate(x_np, v_np, mode="valid"),
    )
    g = nps.gradient(x)
    assert np.allclose(g.get(), np.gradient(x_np))
    assert np.allclose(float(nps.trapezoid(x)), np.trapezoid(x_np))
    assert np.allclose(nps.sinc(x).get(), np.sinc(x_np))
    assert np.allclose(nps.ediff1d(x).get(), np.ediff1d(x_np))
    assert np.allclose(
        nps.vander(nps.array(np.arange(1.0, 4.0))).get(),
        np.vander(np.arange(1.0, 4.0)),
    )
    assert np.allclose(nps.tri(4, 5, 1).get(), np.tri(4, 5, 1))
    a3 = np.array([1.0, 0.0, 0.0])
    b3 = np.array([0.0, 1.0, 0.0])
    assert np.allclose(
        nps.cross(nps.array(a3), nps.array(b3)).get(), np.cross(a3, b3)
    )
    mx, my = nps.meshgrid(nps.array(np.arange(3.0)), nps.array(np.arange(4.0)))
    ex, ey = np.meshgrid(np.arange(3.0), np.arange(4.0))
    assert np.allclose(mx.get(), ex) and np.allclose(my.get(), ey)


def test_remaining_tranche():
    rs = np.random.RandomState(10)
    x_np = rs.randn(12, 6)
    x = nps.array(x_np)
    assert np.allclose(nps.full_like(x, 3.5).get(), np.full_like(x_np, 3.5))
    assert np.allclose(nps.geomspace(1, 1000, 4).get(),
                       np.geomspace(1, 1000, 4))
    assert np.allclose(
        nps.append(x, x, axis=0).get(), np.append(x_np, x_np, axis=0)
    )
    parts = nps.array_split(x, 5, axis=0)
    ref = np.array_split(x_np, 5, axis=0)
    assert len(parts) == len(ref)
    for p, r in zip(parts, ref):
        assert np.allclose(p.get(), r)
    v, h = nps.vsplit(x, 3), nps.hsplit(x, 2)
    assert np.allclose(v[0].get(), np.vsplit(x_np, 3)[0])
    assert np.allclose(h[1].get(), np.hsplit(x_np, 2)[1])
    assert nps.atleast_3d(nps.array(np.arange(3))).shape == (1, 3, 1)
    assert np.allclose(nps.diagonal(x).get(), np.diagonal(x_np))
    dv = np.arange(4.0)
    assert np.allclose(nps.diagflat(nps.array(dv)).get(), np.diagflat(dv))
    bins = np.array([-1.0, 0.0, 1.0])
    assert np.array_equal(
        nps.digitize(x, nps.array(bins)).get(), np.digitize(x_np, bins)
    )
    assert np.allclose(nps.fix(x).get(), np.fix(x_np))
    q, r = nps.divmod(nps.array(np.arange(1.0, 10.0)), 4.0)
    eq, er = np.divmod(np.arange(1.0, 10.0), 4.0)
    assert np.allclose(q.get(), eq) and np.allclose(r.get(), er)
    cond = np.array([True, False, True])
    assert np.allclose(
        nps.compress(nps.array(cond), x[:3], axis=0).get(),
        np.compress(cond, x_np[:3], axis=0),
    )
    assert np.allclose(
        nps.extract(nps.array(x_np > 0), x).get(), np.extract(x_np > 0, x_np)
    )
    ba = nps.broadcast_arrays(x[:1], x)
    assert ba[0].shape == x.shape
    assert nps.broadcast_shapes((3, 1), (1, 4)) == (3, 4)
    assert np.allclose(nps.acos(nps.array(np.array([0.5]))).get(),
                       np.arccos([0.5]))
    assert np.allclose(nps.atan2(x, x + 3.0).get(), np.arctan2(x_np, x_np + 3.0))
    assert np.allclose(nps.concat([x, x]).get(), np.concatenate([x_np, x_np]))
    assert np.allclose(nps.pow(nps.abs(x), 2.0).get(), np.abs(x_np) ** 2)
    assert np.allclose(nps.permute_dims(x).get(), x_np.T)
    assert nps.astype(x, np.float32).dtype == np.float32


def test_third_tranche():
    rs = np.random.RandomState(11)
    x_np = rs.randn(30)
    x = nps.array(x_np)
    assert np.array_equal(
        nps.isin(nps.array(np.array([1, 2, 3])), nps.array(np.array([2]))).get(),
        np.isin([1, 2, 3], [2]),
    )
    assert bool(nps.all(nps.isreal(x)))
    assert not bool(nps.any(nps.iscomplex(x)))
    inf_arr = np.array([np.inf, -np.inf, 1.0])
    assert np.array_equal(nps.isneginf(nps.array(inf_arr)).get(),
                          np.isneginf(inf_arr))
    assert np.array_equal(nps.isposinf(nps.array(inf_arr)).get(),
                          np.isposinf(inf_arr))
    xn = x_np.copy(); xn[3] = np.nan
    bn = nps.array(xn)
    assert int(nps.nanargmax(bn)) == np.nanargmax(xn)
    assert np.allclose(nps.nancumsum(bn).get(), np.nancumsum(xn))
    assert np.allclose(nps.nanprod(bn).get(), np.nanprod(xn))
    assert np.allclose(float(nps.nanpercentile(bn, 50)),
                       np.nanpercentile(xn, 50))
    m_np = rs.randn(4, 5)
    m = nps.array(m_np)
    idx = np.argsort(m_np, axis=1)
    assert np.allclose(
        nps.take_along_axis(m, nps.array(idx), axis=1).get(),
        np.take_along_axis(m_np, idx, axis=1),
    )
    sel = nps.select([m > 0.5, m < -0.5], [m, -m], default=0.0)
    assert np.allclose(
        sel.get(), np.select([m_np > 0.5, m_np < -0.5], [m_np, -m_np], 0.0)
    )
    flat = np.array([0, 7, 13])
    ur = nps.unravel_index(nps.array(flat), (4, 5))
    er = np.unravel_index(flat, (4, 5))
    assert np.array_equal(ur[0].get(), er[0]) and np.array_equal(ur[1].get(), er[1])
    rm = nps.ravel_multi_index([nps.array(er[0]), nps.array(er[1])], (4, 5))
    assert np.array_equal(rm.get(), flat)
    tr, tc = nps.tril_indices(4)
    er2 = np.tril_indices(4)
    assert np.array_equal(tr.get(), er2[0]) and np.array_equal(tc.get(), er2[1])
    p = np.array([2.0, 0.0, 1.0])
    assert np.allclose(nps.polyval(nps.array(p), x).get(), np.polyval(p, x_np))
    xs = np.linspace(0, 1, 50)
    ys = 3 * xs ** 2 + 1
    fit = nps.polyfit(nps.array(xs), nps.array(ys), 2).get()
    assert np.allclose(fit, [3.0, 0.0, 1.0], atol=1e-6)
    assert np.allclose(nps.hamming(8).get(), np.hamming(8))
    assert np.allclose(nps.kaiser(8, 3.0).get(), np.kaiser(8, 3.0))
    assert np.allclose(nps.i0(x).get(), np.i0(x_np))
    e = nps.histogram_bin_edges(x, bins=5)
    assert np.allclose(e.get(), np.histogram_bin_edges(x_np, bins=5))
    h2, ex, ey = nps.histogram2d(x, nps.array(rs.randn(30)), bins=4)
    assert h2.shape == (4, 4)
    ph = np.linspace(0, 4 * np.pi, 20) % (2 * np.pi)
    assert np.allclose(nps.unwrap(nps.array(ph)).get(), np.unwrap(ph))


def test_fourth_tranche():
    rs = np.random.RandomState(12)
    x_np = rs.randn(20)
    x = nps.array(x_np)
    assert np.allclose(np.sort(nps.partition(x, 5).get()[:5]),
                       np.sort(np.partition(x_np, 5)[:5]))
    ap = nps.argpartition(x, 5).get()
    assert set(x_np[ap[:5]]) == set(np.partition(x_np, 5)[:5])
    k1, k2 = rs.randint(0, 3, 20), rs.randint(0, 3, 20)
    assert np.array_equal(
        nps.lexsort([nps.array(k1), nps.array(k2)]).get(),
        np.lexsort([k1, k2]),
    )
    f, w = nps.modf(x)
    ef, ew = np.modf(x_np)
    assert np.allclose(f.get(), ef) and np.allclose(w.get(), ew)
    m_np = rs.randn(3, 4)
    m = nps.array(m_np)
    assert np.allclose(nps.rot90(m).get(), np.rot90(m_np))
    a3 = rs.randn(2, 3, 4)
    assert np.allclose(nps.rollaxis(nps.array(a3), 2).get(),
                       np.rollaxis(a3, 2))
    assert np.allclose(
        nps.vecdot(m, m).get(), np.vecdot(m_np, m_np)
    )
    blk = nps.block([[nps.array(np.ones((2, 2))), nps.array(np.zeros((2, 2)))]])
    assert blk.shape == (2, 4)
    idx = np.array([0, 1, 0])
    ch = nps.choose(nps.array(idx), [nps.array(np.zeros(3)), nps.array(np.ones(3))])
    assert np.allclose(ch.get(), np.choose(idx, [np.zeros(3), np.ones(3)]))
    assert np.allclose(nps.delete(x, 3).get(), np.delete(x_np, 3))
    assert np.allclose(
        nps.insert(x, 2, 99.0).get(), np.insert(x_np, 2, 99.0)
    )
    assert bool(nps.array_equiv(x, x))
    a_set = np.array([1, 2, 3, 4])
    b_set = np.array([3, 4, 5])
    assert np.array_equal(
        nps.intersect1d(nps.array(a_set), nps.array(b_set)).get(),
        np.intersect1d(a_set, b_set),
    )
    assert np.array_equal(
        nps.setdiff1d(nps.array(a_set), nps.array(b_set)).get(),
        np.setdiff1d(a_set, b_set),
    )
    assert np.array_equal(
        nps.union1d(nps.array(a_set), nps.array(b_set)).get(),
        np.union1d(a_set, b_set),
    )
    assert np.array_equal(
        nps.in1d(nps.array(a_set), nps.array(b_set)).get(),
        np.isin(a_set, b_set),
    )
    uc = nps.unique_counts(nps.array(np.array([1, 1, 2, 3, 3, 3])))
    assert np.array_equal(uc.values.get(), [1, 2, 3])
    assert np.array_equal(uc.counts.get(), [2, 1, 3])
    tz = nps.trim_zeros(nps.array(np.array([0.0, 0.0, 1.0, 2.0, 0.0])))
    assert np.array_equal(tz.get(), [1.0, 2.0])
    p1, p2 = np.array([1.0, 2.0]), np.array([1.0, -1.0])
    assert np.allclose(nps.polymul(nps.array(p1), nps.array(p2)).get(),
                       np.polymul(p1, p2))
    assert np.allclose(nps.polyadd(nps.array(p1), nps.array(p2)).get(),
                       np.polyadd(p1, p2))
    assert np.allclose(nps.polyder(nps.array(np.array([3.0, 0.0, 1.0]))).get(),
                       np.polyder(np.array([3.0, 0.0, 1.0])))
    r = nps.roots(nps.array(np.array([1.0, -3.0, 2.0]))).get()
    assert np.allclose(np.sort(r.real), [1.0, 2.0])
    assert nps.issubdtype(x.dtype, np.floating)


def test_random_generator_api_and_linalg_gaps():
    rng = nps.random.default_rng(42)
    v = rng.integers(0, 10, size=(50,))
    assert ((0 <= v.get()) & (v.get() < 10)).all()
    raw = nps.random.bytes(16)
    assert isinstance(raw, bytes) and len(raw) == 16
    a3 = np.array([1.0, 0.0, 0.0])
    b3 = np.array([0.0, 1.0, 0.0])
    assert np.allclose(
        nps.linalg.cross(nps.array(a3), nps.array(b3)).get(),
        np.cross(a3, b3),
    )
    rs = np.random.RandomState(3)
    a = rs.randn(4, 6, 8, 3)
    at = nps.array(a.reshape(24, 24) + 24 * np.eye(24)).reshape((4, 6, 8, 3))
    b_np = rs.randn(4, 6)
    x = nps.linalg.tensorsolve(at, nps.array(b_np))
    expected = np.linalg.tensorsolve(at.get(), b_np)
    assert np.allclose(x.get(), expected, atol=1e-8)
    spd = a.reshape(24, 24); spd = spd @ spd.T + 24 * np.eye(24)
    w, vv = nps.linalg.eig(nps.array(spd))
    assert np.allclose(np.sort(w.get().real), np.sort(np.linalg.eigvalsh(spd)),
                       atol=1e-8)
    wv = nps.linalg.eigvals(nps.array(spd))
    assert np.allclose(np.sort(wv.get().real), np.sort(np.linalg.eigvalsh(spd)),
                       atol=1e-8)


def test_eig_roots_in_program():
    """Round 4: eig/eigvals/roots ride jax.pure_callback inside a jitted
    program (no Python-level host round trip of the operands), keeping
    numpy's data-dependent output dtypes: real iff everything is real."""
    # Rotation matrix: genuinely complex eigenvalues.
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    w, v = nps.linalg.eig(nps.array(rot))
    wn, vn = np.linalg.eig(rot)
    assert np.issubdtype(w.get().dtype, np.complexfloating)
    assert np.allclose(np.sort_complex(w.get()), np.sort_complex(wn))
    # Reconstruction oracle: A v = v diag(w).
    assert np.allclose(rot @ v.get(), v.get() @ np.diag(w.get()),
                       atol=1e-8)
    # Real-spectrum input: numpy returns REAL arrays; parity holds.
    spd = np.array([[2.0, 1.0], [1.0, 2.0]])
    w2, v2 = nps.linalg.eig(nps.array(spd))
    assert not np.issubdtype(w2.get().dtype, np.complexfloating)
    assert not np.issubdtype(v2.get().dtype, np.complexfloating)
    wv = nps.linalg.eigvals(nps.array(rot))
    assert np.issubdtype(wv.get().dtype, np.complexfloating)
    assert np.allclose(np.sort_complex(wv.get()), np.sort_complex(wn))
    # roots: leading zeros shrink the output (the count sync), and the
    # all-real spectrum comes back real like np.roots does.
    p = np.array([0.0, 0.0, 1.0, -3.0, 2.0])
    r = nps.roots(nps.array(p))
    rn = np.roots(p)
    assert r.shape == rn.shape
    assert np.allclose(np.sort(r.get()), np.sort(rn))
    assert not np.issubdtype(r.get().dtype, np.complexfloating)
    pc = np.array([1.0, 0.0, 1.0])  # x^2 + 1: complex roots
    rc = nps.roots(nps.array(pc))
    assert np.issubdtype(rc.get().dtype, np.complexfloating)
    assert np.allclose(np.sort_complex(rc.get()),
                       np.sort_complex(np.roots(pc)))
    # COMPLEX coefficients keep a complex dtype even when every root is
    # real (np.roots([1+0j,-3+0j,2+0j]) is complex128) — same guard as
    # eig/eigvals (ADVICE r4).
    pz = np.array([1.0 + 0j, -3.0 + 0j, 2.0 + 0j])
    rz = nps.roots(nps.array(pz))
    assert np.issubdtype(rz.get().dtype, np.complexfloating)
    assert np.issubdtype(np.roots(pz).dtype, np.complexfloating)
    assert np.allclose(np.sort_complex(rz.get()),
                       np.sort_complex(np.roots(pz)))


def test_mutation_family():
    rs = np.random.RandomState(13)
    x_np = rs.randn(4, 5)
    x = nps.array(x_np.copy())
    e = x_np.copy()
    nps.put(x, nps.array(np.array([0, 7])), nps.array(np.array([9.0, 8.0])))
    np.put(e, [0, 7], [9.0, 8.0])
    assert np.allclose(x.get(), e)

    x = nps.array(x_np.copy()); e = x_np.copy()
    idx = np.argmax(e, axis=1, keepdims=True)
    nps.put_along_axis(x, nps.array(idx), nps.array(np.array([[0.0]]*4)), 1)
    np.put_along_axis(e, idx, 0.0, 1)
    assert np.allclose(x.get(), e)

    x = nps.array(x_np.copy()); e = x_np.copy()
    mask = e > 0
    nps.place(x, nps.array(mask), nps.array(np.array([1.0, 2.0])))
    np.place(e, mask, [1.0, 2.0])
    assert np.allclose(x.get(), e)

    x = nps.array(x_np.copy()); e = x_np.copy()
    nps.putmask(x, nps.array(mask), nps.array(e * 10))
    np.putmask(e, mask, e * 10)
    assert np.allclose(x.get(), e)

    x = nps.array(x_np.copy()); e = x_np.copy()
    nps.copyto(x, nps.array(np.zeros(5)))
    np.copyto(e, np.zeros(5))
    assert np.allclose(x.get(), e)

    sq = nps.array(x_np[:4, :4].copy()); esq = x_np[:4, :4].copy()
    nps.fill_diagonal(sq, 7.0)
    np.fill_diagonal(esq, 7.0)
    assert np.allclose(sq.get(), esq)

    import jax.numpy as jnp
    out = nps.apply_along_axis(jnp.sum, 1, nps.array(x_np))
    assert np.allclose(out.get(), x_np.sum(axis=1))


def test_compat_tranche():
    rs = np.random.RandomState(14)
    x_np = rs.randn(4, 4)
    x = nps.array(x_np)
    assert np.allclose(nps.asarray_chkfinite(x).get(), x_np)
    bad = nps.array(np.array([1.0, np.nan]))
    with pytest.raises(ValueError):
        nps.asarray_chkfinite(bad)
    assert np.allclose(nps.ascontiguousarray(x).get(), x_np)
    assert nps.isfortran(x) is False
    assert np.allclose(nps.resize(x, (2, 8)).get(), np.resize(x_np, (2, 8)))
    bits = np.array([1, 0, 1, 1, 0, 0, 0, 1], dtype=np.uint8)
    packed = nps.packbits(nps.array(bits))
    assert np.array_equal(packed.get(), np.packbits(bits))
    assert np.array_equal(
        nps.unpackbits(packed).get(), np.unpackbits(np.packbits(bits))
    )
    s2 = rs.randn(100, 2)
    h, edges = nps.histogramdd(nps.array(s2), bins=4)
    eh, eedges = np.histogramdd(s2, bins=4)
    assert np.allclose(h.get(), eh)
    assert np.allclose(edges[0].get(), eedges[0])
    tr = nps.tril_indices_from(x)
    er = np.tril_indices_from(x_np)
    assert np.array_equal(tr[0].get(), er[0])
    dg = nps.diag_indices_from(x)
    assert np.array_equal(dg[0].get(), np.diag_indices_from(x_np)[0])
    assert "1." in nps.array_str(x)
    assert nps.base_repr(10, 2) == "1010"
    assert nps.common_type(x) in (np.float64, np.float32)
    path = nps.einsum_path("ij,jk->ik", x, x)
    assert isinstance(path[0], list)
    mi = nps.mask_indices(3, np.triu)
    emi = np.mask_indices(3, np.triu)
    assert np.array_equal(mi[0].get(), emi[0])


def test_from_constructors():
    import jax.numpy as jnp
    f = nps.fromfunction(lambda i, j: i + j, (3, 3))
    assert np.allclose(f.get(), np.fromfunction(lambda i, j: i + j, (3, 3)))
    it = nps.fromiter(range(5), dtype=np.int64)
    assert np.array_equal(it.get(), np.arange(5))
    buf = np.arange(4.0).tobytes()
    fb = nps.frombuffer(buf, dtype=np.float64)
    assert np.allclose(fb.get(), np.arange(4.0))
    fs = nps.fromstring("1 2 3", dtype=np.float64)
    assert np.allclose(fs.get(), [1.0, 2.0, 3.0])


def test_sort_default_axis_matches_numpy():
    """Advisor regression: np.sort/argsort default to axis=-1 (NOT None)."""
    rs = np.random.RandomState(3)
    x_np = rs.randn(4, 5)
    x = nps.array(x_np)
    assert np.allclose(nps.sort(x).get(), np.sort(x_np))
    assert np.array_equal(nps.argsort(x).get(), np.argsort(x_np))
    assert np.allclose(nps.sort(x, axis=None).get(), np.sort(x_np, axis=None))
    assert np.allclose(nps.sort(x, axis=0).get(), np.sort(x_np, axis=0))
