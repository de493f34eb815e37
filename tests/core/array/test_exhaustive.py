"""Opt-in exhaustive sweeps (parity: the reference's skipped sweeps —
all-block-shapes tensordot test_bop.py:95-125, full slice enumerations
test_access.py:140-298). Run with: pytest -m slow
"""

import itertools

import numpy as np
import pytest


@pytest.mark.slow
def test_tensordot_all_block_shapes(app_inst):
    rs = np.random.RandomState(0)
    a = rs.randn(12, 10)
    b = rs.randn(10, 8)
    expected = a @ b
    row_blocks = [1, 3, 4, 12]
    inner_blocks = [1, 2, 5, 10]
    col_blocks = [1, 4, 8]
    for br, bi, bc in itertools.product(row_blocks, inner_blocks, col_blocks):
        ba = app_inst.array(a, block_shape=(br, bi))
        bb = app_inst.array(b, block_shape=(bi, bc))
        assert np.allclose((ba @ bb).get(), expected), (br, bi, bc)


@pytest.mark.slow
def test_slice_enumeration_2d(app_inst):
    rs = np.random.RandomState(1)
    x = rs.randn(7, 5)
    bx = app_inst.array(x, block_shape=(3, 2))
    coords = [None, 0, 2, -1, -3]
    steps = [None, 1, 2, -1, -2]
    axis_subscripts = []
    for start, stop, step in itertools.product(coords, coords, steps):
        axis_subscripts.append(slice(start, stop, step))
    axis_subscripts += [0, 3, -1]
    # Sample the cross-product (full product is ~160k pairs).
    rs2 = np.random.RandomState(2)
    pool = list(itertools.product(axis_subscripts, axis_subscripts))
    idx = rs2.choice(len(pool), size=2000, replace=False)
    for i in idx:
        ss = pool[i]
        expected = x[ss]
        result = bx[ss]
        assert result.shape == np.shape(expected), ss
        assert np.allclose(result.get(), expected), ss


@pytest.mark.slow
def test_reshape_enumeration(app_inst):
    rs = np.random.RandomState(3)
    x = rs.randn(24)
    bx = app_inst.array(x, block_shape=(7,))
    shapes = [(24,), (2, 12), (12, 2), (3, 8), (4, 6), (2, 3, 4),
              (6, 2, 2), (2, 2, 3, 2)]
    block_shapes = {
        1: [(5,), (24,)],
        2: [(1, 1), (2, 3)],
        3: [(1, 2, 2), (2, 3, 4)],
        4: [(1, 1, 1, 1), (2, 2, 3, 2)],
    }
    for shape in shapes:
        for bs in block_shapes[len(shape)]:
            bs = tuple(min(b, s) for b, s in zip(bs, shape))
            y = bx.reshape(*shape, block_shape=bs)
            assert np.allclose(y.get(), x.reshape(shape)), (shape, bs)