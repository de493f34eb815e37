"""Facade ops on mesh-indivisible (ragged) shapes.

The extended facade routes through ops/padded.call; these sweeps assert
NumPy parity when inputs carry at-rest padding on the mesh backend (and
identical behavior on serial).
"""

import numpy as np
import pytest

import nums_tpu.numpy as nps
from nums_tpu.numpy import extra, extra2, extra3


@pytest.fixture
def ragged(nps_app_inst):
    rs = np.random.RandomState(7)
    x = rs.randn(13, 9)
    bx = nps_app_inst.array(x, block_shape=(4, 9))
    return x, bx


def test_reduction_scan_family(ragged):
    x, bx = ragged
    for fn in ("prod", "all", "any", "cumsum", "cumprod", "nansum",
               "median", "ptp", "count_nonzero"):
        got = getattr(extra, fn)(bx).get()
        expect = getattr(np, fn)(x)
        assert np.allclose(got, expect), fn
    assert np.allclose(extra.cumsum(bx, axis=0).get(), np.cumsum(x, axis=0))


def test_manipulation_family(ragged):
    x, bx = ragged
    assert np.allclose(extra.sort(bx).get(), np.sort(x))
    assert np.array_equal(extra.argsort(bx).get(), np.argsort(x))
    assert np.allclose(extra.clip(bx, -1, 1).get(), np.clip(x, -1, 1))
    assert np.allclose(extra.around(bx, 2).get(), np.around(x, 2))
    assert np.allclose(extra.flip(bx, 0).get(), np.flip(x, 0))
    assert np.allclose(extra.roll(bx, 3, axis=0).get(), np.roll(x, 3, axis=0))
    assert np.allclose(extra.tile(bx, (2, 1)).get(), np.tile(x, (2, 1)))
    assert np.allclose(extra.repeat(bx, 2, axis=1).get(),
                       np.repeat(x, 2, axis=1))
    assert np.allclose(extra.triu(bx).get(), np.triu(x))
    assert np.allclose(extra.diff(bx, axis=0).get(), np.diff(x, axis=0))
    assert np.allclose(extra.trace(bx).get(), np.trace(x))
    assert np.allclose(extra.diagonal(bx).get(), np.diagonal(x))
    assert np.allclose(
        extra.moveaxis(bx, 0, 1).get(), np.moveaxis(x, 0, 1)
    )


def test_stacking_on_ragged(nps_app_inst):
    rs = np.random.RandomState(8)
    a = rs.randn(13, 9)
    b = rs.randn(13, 9)
    ba = nps_app_inst.array(a, block_shape=(4, 9))
    bb = nps_app_inst.array(b, block_shape=(4, 9))
    assert np.allclose(extra.stack([ba, bb]).get(), np.stack([a, b]))
    assert np.allclose(extra.vstack([ba, bb]).get(), np.vstack([a, b]))
    assert np.allclose(extra.hstack([ba, bb]).get(), np.hstack([a, b]))
    assert np.allclose(
        extra.isclose(ba, bb).get(), np.isclose(a, b)
    )
    assert bool(extra.array_equal(ba, ba).get())


def test_stats_family(ragged):
    x, bx = ragged
    assert np.allclose(
        extra.percentile(bx, 30).get(), np.percentile(x, 30)
    )
    assert np.allclose(
        extra.quantile(bx, [0.2, 0.8]).get(), np.quantile(x, [0.2, 0.8])
    )
    h, e = extra.histogram(bx, bins=5)
    hn, en = np.histogram(x, bins=5)
    assert np.array_equal(h.get(), hn) and np.allclose(e.get(), en)
    assert np.allclose(extra.cov(bx).get(), np.cov(x), atol=1e-12)
    q, r = extra.divmod(bx, 2.0)
    qn, rn = np.divmod(x, 2.0)
    assert np.allclose(q.get(), qn) and np.allclose(r.get(), rn)


def test_tranche3_family(ragged):
    x, bx = ragged
    assert np.allclose(
        extra3.partition(bx, 4, axis=1).get()[:, 4], np.partition(x, 4, axis=1)[:, 4]
    )
    f, w = extra3.modf(bx)
    fn, wn = np.modf(x)
    assert np.allclose(f.get(), fn) and np.allclose(w.get(), wn)
    assert np.allclose(extra3.rot90(bx).get(), np.rot90(x))
    v = np.arange(9.0)
    bv = nps.array(v)
    assert np.allclose(
        extra3.vecdot(bx, bv).get(), np.vecdot(x, v)
    )
    assert np.allclose(
        extra2.take_along_axis(
            bx, extra.argsort(bx), 1
        ).get(),
        np.take_along_axis(x, np.argsort(x), 1),
    )


def test_mutation_family_on_ragged(nps_app_inst):
    from nums_tpu.numpy import extra4

    rs = np.random.RandomState(9)
    x = rs.randn(13, 9)
    bx = nps_app_inst.array(x.copy(), block_shape=(4, 9))
    extra4.fill_diagonal(bx, 5.0)
    e = x.copy()
    np.fill_diagonal(e, 5.0)
    assert np.allclose(bx.get(), e)
    extra4.putmask(bx, bx > 1.0, nps.array(np.zeros_like(x)))
    np.putmask(e, e > 1.0, np.zeros_like(e))
    assert np.allclose(bx.get(), e)
