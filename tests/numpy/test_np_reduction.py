"""Reduction sweep across ops × axes × keepdims × block shapes
(parity: reference tests/numpy/test_np_reduction.py)."""

import itertools

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


import nums_tpu.numpy as nps  # noqa: E402


def test_reductions_sweep():
    ba = nps.array([[5.0, -2.0, 4.0, 8.0], [3.0, 6.0, 1.0, 7.0]])
    block_shapes = [(1, 1), (1, 2), (1, 4), (2, 1), (2, 4)]
    for block_shape in block_shapes:
        ba = ba.reshape(block_shape=block_shape)
        np_arr = ba.get()
        ops = ["amin", "min", "amax", "max", "sum", "mean", "var", "std"]
        for op, axis, keepdims in itertools.product(
            ops, [None, 0, 1], [True, False]
        ):
            expected = getattr(np, op)(np_arr, axis=axis, keepdims=keepdims)
            result = getattr(nps, op)(ba, axis=axis, keepdims=keepdims)
            assert result.shape == np.shape(expected), (op, axis, keepdims)
            assert np.allclose(result.get(), expected), (
                op, axis, keepdims, block_shape,
            )


def test_argops_sweep():
    arrays = [
        [5.0, -2.0, 4.0, 8.0],
        [1.0, 2.0, 3.0, 4.0],
        [3.0, 2.0, 1.0, 0.0],
        [-1.0, -2.0, -3.0, -0.0],
    ]
    for vals in arrays:
        ba = nps.array(vals)
        for block_shape in [(1,), (2,), (3,), (4,)]:
            ba = ba.reshape(block_shape=block_shape)
            np_arr = ba.get()
            for op, axis in itertools.product(
                ["argmin", "argmax"], [None, 0]
            ):
                expected = getattr(np, op)(np_arr, axis=axis)
                result = getattr(nps, op)(ba, axis=axis)
                assert int(result) == int(expected), (vals, op, axis)