"""Device-side where/boolean-mask path (VERDICT weak #5).

Asserts np.where parity on both backends, capacity bucketing (bounded
program count), and that index results stay on device (no O(condition)
host fetch — the only sync is the scalar count).
"""

import numpy as np
import pytest

import jax

from nums_tpu.core.ops import masking


def test_capacity_buckets():
    assert masking.capacity_for(0) == 0
    assert masking.capacity_for(1) == 1
    assert masking.capacity_for(2) == 2
    assert masking.capacity_for(3) == 4
    assert masking.capacity_for(1000) == 1024
    assert masking.capacity_for(1024) == 1024


@pytest.mark.parametrize("shape", [(50,), (13, 9), (1003, 7)])
def test_where_matches_numpy(app_inst, shape):
    rs = np.random.RandomState(5)
    x = rs.randn(*shape)
    bs = (max(1, shape[0] // 4),) + tuple(shape[1:])
    bx = app_inst.array(x, block_shape=bs)
    got = app_inst.where(bx > 0)
    expect = np.where(x > 0)
    assert len(got) == len(expect)
    for g, e in zip(got, expect):
        assert np.array_equal(g.get(), e)
    # empty result
    got0 = app_inst.where(bx > 1e9)
    for g in got0:
        assert g.shape == (0,)


def test_where_indices_stay_on_device(app_inst):
    rs = np.random.RandomState(6)
    x = rs.randn(1003, 7)
    bx = app_inst.array(x, block_shape=(126, 7))
    count, idx = masking.device_where(bx > 0)
    assert count == int((x > 0).sum())
    for i in idx:
        assert isinstance(i, jax.Array)
        assert i.shape == (count,)
    rows, cols = np.where(x > 0)
    assert np.array_equal(np.asarray(idx[0]), rows)
    assert np.array_equal(np.asarray(idx[1]), cols)


def test_bool_mask_blockarray_read(app_inst):
    rs = np.random.RandomState(7)
    x = rs.randn(200, 5)
    bx = app_inst.array(x, block_shape=(50, 5))
    bmask = bx > 0.3
    assert np.allclose(bx[bmask].get(), x[x > 0.3])
    rowmask = bx[:, 0] < 0
    assert np.allclose(bx[rowmask].get(), x[x[:, 0] < 0])


def test_argwhere_flatnonzero_device(nps_app_inst):
    import nums_tpu.numpy as nps

    rs = np.random.RandomState(8)
    x = rs.randn(37, 4)
    bx = nps.array(x)
    assert np.array_equal(nps.argwhere(bx > 0).get(), np.argwhere(x > 0))
    assert np.array_equal(
        nps.flatnonzero(bx > 0).get(), np.flatnonzero(x > 0)
    )
