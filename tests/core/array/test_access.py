"""Indexing/assignment oracle tests (parity: reference test_access.py /
test_view.py — NumPy basic indexing semantics plus 1-D advanced gather)."""

import numpy as np
import pytest


def test_basic_getitem(app_inst):
    rs = np.random.RandomState(0)
    x = rs.randn(21, 13)
    bx = app_inst.array(x, block_shape=(6, 5))
    subscripts = [
        (slice(None),),
        (slice(3, 17),),
        (slice(None), slice(2, 9)),
        (slice(1, 20, 3),),
        (slice(None, None, -1),),
        (slice(18, 2, -2), slice(None, None, -1)),
        (5,),
        (slice(None), 7),
        (3, 4),
        (-1, -2),
        (slice(-8, -2),),
        (Ellipsis, 0),
    ]
    for ss in subscripts:
        expected = x[ss]
        result = bx[ss]
        assert result.shape == np.shape(expected), ss
        assert np.allclose(result.get(), expected), ss


def test_basic_setitem(app_inst):
    rs = np.random.RandomState(1)
    x = rs.randn(12, 10)
    bx = app_inst.array(x.copy(), block_shape=(4, 5))
    # scalar assignment
    bx[2:5] = 0.0
    x[2:5] = 0.0
    assert np.allclose(bx.get(), x)
    # array assignment
    v = rs.randn(3, 10)
    bx[6:9] = app_inst.array(v, block_shape=(3, 5))
    x[6:9] = v
    assert np.allclose(bx.get(), x)
    # np array assignment with broadcasting
    col = rs.randn(12)
    bx[:, 0] = col
    x[:, 0] = col
    assert np.allclose(bx.get(), x)
    # stepped assignment
    bx[::2, 1] = 7.0
    x[::2, 1] = 7.0
    assert np.allclose(bx.get(), x)


def test_assign_dependencies(app_inst):
    """Aliased assignment chain (parity: reference test_access.py:120-138 —
    the defensive-copy regression test; immutability makes it structural
    here)."""
    x = np.zeros((10,))
    bx = app_inst.array(x.copy(), block_shape=(5,))
    y = bx[2:6]
    bx[0:4] = y
    x[0:4] = x[2:6]
    assert np.allclose(bx.get(), x)
    # y must be unaffected by subsequent mutation of bx
    y_before = y.get().copy()
    bx[2:6] = 99.0
    assert np.allclose(y.get(), y_before)


def test_advanced_1d_gather(app_inst):
    rs = np.random.RandomState(2)
    x = rs.randn(30, 4)
    bx = app_inst.array(x, block_shape=(10, 2))
    perm = rs.permutation(30)
    bperm = app_inst.array(perm, block_shape=(10,))
    assert np.allclose(bx[perm].get(), x[perm])
    assert np.allclose(bx[bperm].get(), x[perm])
    idx = np.array([3, 3, 0, 29])
    assert np.allclose(bx[idx].get(), x[idx])


def test_boolean_mask(app_inst):
    """Beyond the reference (which raises): masked read via host-synced
    gather; masked write fully on-device."""
    rs = np.random.RandomState(11)
    x = rs.randn(20, 4)
    bx = app_inst.array(x.copy(), block_shape=(5, 2))
    mask = x > 0
    assert np.allclose(bx[mask].get(), x[mask])
    # leading-axis mask
    rowmask = x[:, 0] > 0
    assert np.allclose(bx[rowmask].get(), x[rowmask])
    brmask = app_inst.array(rowmask, block_shape=(5,))
    assert np.allclose(bx[brmask].get(), x[rowmask])
    # on-device masked write (scalar)
    bx[mask] = 0.0
    x[mask] = 0.0
    assert np.allclose(bx.get(), x)
    # packed-vector masked write
    vals = rs.randn(int(rowmask.sum()) * 4)
    m2 = np.tile(rowmask[:, None], (1, 4))
    bx[m2] = vals
    x[m2] = vals
    assert np.allclose(bx.get(), x)


def test_scalar_result_and_len(app_inst):
    x = np.arange(12).reshape(3, 4).astype(float)
    bx = app_inst.array(x, block_shape=(3, 2))
    assert float(bx[1, 2]) == x[1, 2]
    assert len(bx) == 3
    with pytest.raises(TypeError):
        len(bx[0, 0])


def test_assignment_sweep(app_inst):
    """Generative get/set sweep against the NumPy oracle (role of the
    reference's left/right-mode assignment matrix, test_view.py:147)."""
    rs = np.random.RandomState(99)
    shape = (13, 9)
    subscripts = [
        (slice(None), slice(None)),
        (slice(2, 11), slice(1, 8)),
        (slice(0, 13, 2), slice(None)),
        (slice(None), slice(8, None, -2)),
        (slice(-4, None), slice(None, 4)),
        (5, slice(2, 7)),
        (slice(3, 4), slice(None)),
    ]
    for ss in subscripts:
        x = rs.randn(*shape)
        bx = app_inst.array(x.copy(), block_shape=(4, 3))
        target_shape = np.empty(shape)[ss].shape
        v = rs.randn(*target_shape) if target_shape else rs.randn()
        # BlockArray value
        bv = app_inst.array(np.asarray(v), block_shape=target_shape) \
            if target_shape else float(v)
        bx[ss] = bv
        x[ss] = v
        assert np.allclose(bx.get(), x), ss
        # numpy value
        bx2 = app_inst.array(x.copy(), block_shape=(5, 9))
        bx2[ss] = np.asarray(v) if target_shape else float(v)
        assert np.allclose(bx2.get(), x), ss
        # broadcast scalar
        bx3 = app_inst.array(x.copy(), block_shape=(13, 2))
        bx3[ss] = 1.5
        x[ss] = 1.5
        assert np.allclose(bx3.get(), x), ss


def test_multidim_advanced_indexing(app_inst):
    """Beyond the reference (which supports 1-D advanced only): full
    NumPy advanced indexing via XLA gather."""
    rs = np.random.RandomState(123)
    x = rs.randn(12, 9)
    bx = app_inst.array(x, block_shape=(4, 3))
    rows = np.array([0, 5, 11])
    cols = np.array([8, 0, 4])
    assert np.allclose(bx[rows, cols].get(), x[rows, cols])
    assert np.allclose(
        bx[rows[:, None], cols[None, :]].get(), x[rows[:, None], cols[None, :]]
    )
    # mixed basic+advanced
    assert np.allclose(bx[2:7, cols].get(), x[2:7, cols])
    # setitem with advanced index
    bx[rows, cols] = 0.0
    x[rows, cols] = 0.0
    assert np.allclose(bx.get(), x)


def test_boolean_mask_packed_assignment(app_inst):
    """Advisor regression: a[mask] = v with non-scalar v must assign in
    packed (row-major True-position) order, exactly as NumPy — never via
    positional where-broadcast, even when v's shape happens to broadcast
    against a.shape."""
    x = np.array([[1.0, 2.0], [3.0, 4.0]])
    mask = np.array([[False, True], [True, False]])
    bx = app_inst.array(x.copy(), block_shape=(1, 2))
    bx[mask] = np.array([10.0, 20.0])
    expect = x.copy()
    expect[mask] = np.array([10.0, 20.0])
    assert np.allclose(bx.get(), expect)  # [[1,10],[20,4]]
    # Row-mask with per-row vectors (packed rows).
    x2 = np.arange(12, dtype=float).reshape(4, 3)
    rowmask = np.array([True, False, True, False])
    bx2 = app_inst.array(x2.copy(), block_shape=(2, 3))
    v = np.array([[100.0, 101.0, 102.0], [200.0, 201.0, 202.0]])
    bx2[rowmask] = v
    e2 = x2.copy()
    e2[rowmask] = v
    assert np.allclose(bx2.get(), e2)
    # Scalar-like still broadcasts to every True position.
    bx2[rowmask] = np.array([5.0])
    e2[rowmask] = np.array([5.0])
    assert np.allclose(bx2.get(), e2)
