"""Block-shape planner parity (reference tests/numpy/test_np_utils.py:52-127
— asserts the planner's grid shapes for hypothetical cluster shapes
without launching anything)."""

import numpy as np

from nums_tpu.core.grid import ArrayGrid


def test_block_shape(nps_app_inst):
    app = nps_app_inst
    dtype = np.float64

    shape = (10**9, 250)
    block_shape = app.compute_block_shape(
        shape=shape, dtype=dtype, cluster_shape=(1, 1), num_cores=64
    )
    grid = ArrayGrid(shape, block_shape, dtype.__name__)
    assert grid.grid_shape == (64, 1)

    cluster_shape = (16, 1)
    num_cores = 64 * int(np.prod(cluster_shape))
    block_shape = app.compute_block_shape(
        shape=shape, dtype=dtype, cluster_shape=cluster_shape,
        num_cores=num_cores,
    )
    grid = ArrayGrid(shape, block_shape, dtype.__name__)
    assert grid.grid_shape == (num_cores, 1)

    shape = (250, 10**9)
    block_shape = app.compute_block_shape(
        shape=shape, dtype=dtype, cluster_shape=(1, 16), num_cores=num_cores
    )
    grid = ArrayGrid(shape, block_shape, dtype.__name__)
    assert grid.grid_shape == (1, num_cores)

    shape = (10**4, 10**4)
    block_shape = app.compute_block_shape(
        shape=shape, dtype=dtype, cluster_shape=(1, 1), num_cores=64
    )
    grid = ArrayGrid(shape, block_shape, dtype.__name__)
    assert grid.grid_shape == (8, 8)

    # Exactly at the 100MB single-block threshold: still split.
    shape = (10**4, 10**4 // 8)
    block_shape = app.compute_block_shape(
        shape=shape, dtype=dtype, cluster_shape=(1, 1), num_cores=64
    )
    grid = ArrayGrid(shape, block_shape, dtype.__name__)
    assert grid.grid_shape != (1, 1)

    # One element below: single block.
    shape = (10**4, 10**4 // 8 - 1)
    block_shape = app.compute_block_shape(
        shape=shape, dtype=dtype, cluster_shape=(1, 1), num_cores=64
    )
    grid = ArrayGrid(shape, block_shape, dtype.__name__)
    assert grid.grid_shape == (1, 1)


def test_get_block_shape_memoization(nps_app_inst):
    app = nps_app_inst
    app._block_shape_map.clear()
    bs1 = app.get_block_shape((10**6, 100), np.float64)
    # Same dims reuse the memoized per-dimension sizes (application.py:132-142).
    bs2 = app.get_block_shape((100, 10**6), np.float64)
    assert bs1[0] == bs2[1] and bs1[1] == bs2[0]
