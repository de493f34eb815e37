"""ArrayGrid metadata unit tests (parity: reference ArrayGrid semantics,
storage.py:29-87 — ragged edges, meta round-trip, entry iteration)."""

import numpy as np
import pytest

from nums_tpu.core.grid import ArrayGrid, array_split_partitions, cdiv


def test_grid_shapes_and_slices():
    g = ArrayGrid((10, 7), (4, 3), "float64")
    assert g.grid_shape == (3, 3)
    assert g.num_blocks == 9
    entries = list(g.get_entry_iterator())
    assert len(entries) == 9
    # ragged final blocks
    assert g.get_block_shape((0, 0)) == (4, 3)
    assert g.get_block_shape((2, 2)) == (2, 1)
    assert g.get_slice_tuples((2, 2)) == ((8, 10), (6, 7))
    # slices tile the array exactly
    covered = np.zeros((10, 7), dtype=int)
    for e in entries:
        covered[g.get_slice(e)] += 1
    assert (covered == 1).all()


def test_grid_meta_roundtrip():
    g = ArrayGrid((10, 7), (4, 3), "float32")
    g2 = ArrayGrid.from_meta(g.to_meta())
    assert g2.shape == g.shape
    assert g2.block_shape == g.block_shape
    assert g2.grid_shape == g.grid_shape
    assert g2.dtype == "float32"
    g3 = g.copy()
    assert g3.to_meta() == g.to_meta()
    assert g3 is not g


def test_grid_edge_cases():
    # scalar grid
    g = ArrayGrid((), (), "float64")
    assert g.grid_shape == ()
    assert list(g.get_entry_iterator()) == [()]
    # zero-size axis
    g0 = ArrayGrid((0,), (0,), "int64")
    assert g0.num_blocks == 1
    # block_shape larger than shape clamps
    gc = ArrayGrid((3, 2), (10, 10), "float64")
    assert gc.block_shape == (3, 2)
    assert gc.grid_shape == (1, 1)
    # nbytes
    assert ArrayGrid((4, 2), (2, 2), "float64").nbytes() == 64


def test_partition_helpers():
    assert cdiv(10, 3) == 4
    assert array_split_partitions(10, 4) == [(0, 4), (4, 8), (8, 10)]
    assert array_split_partitions(0, 4) == [(0, 0)]

def test_grid_rejects_nonpositive_block_dims():
    """Advisor backstop: an unresolved -1 (or 0) block dim must fail loudly
    at ArrayGrid construction, not produce a zero-block grid."""
    import pytest

    with pytest.raises(AssertionError):
        ArrayGrid((12, 2), (-1, 2), "float64")
    with pytest.raises(AssertionError):
        ArrayGrid((12, 2), (0, 2), "float64")
    # Zero-size axes remain legal (block dim 0 allowed only when size 0).
    g = ArrayGrid((0, 3), (0, 3), "float64")
    assert g.grid_shape == (1, 1)
