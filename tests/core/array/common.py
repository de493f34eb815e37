"""Shared test helpers (parity: reference tests/core/array/common.py)."""

import numpy as np


def check_block_integrity(ba):
    """Every block's grid_entry/rect/shape must match its grid slot
    (parity: the structural invariant checker used throughout the
    reference's test_bop)."""
    for grid_entry in ba.grid.get_entry_iterator():
        block = ba.blocks[grid_entry]
        assert block.grid_entry == grid_entry
        assert block.rect == ba.grid.get_slice_tuples(grid_entry)
        assert block.shape == ba.grid.get_block_shape(grid_entry)
        assert block.dtype == ba.dtype
    # Blocks tile the array exactly.
    total = sum(
        int(np.prod(ba.grid.get_block_shape(e)))
        for e in ba.grid.get_entry_iterator()
    )
    assert total == ba.size
    # Block contents match the region they claim.
    arr = ba.get()
    for grid_entry in ba.grid.get_entry_iterator():
        sl = ba.grid.get_slice(grid_entry)
        assert np.allclose(ba.blocks[grid_entry].get(), arr[sl])