"""Device-side boolean-mask resolution (capacity + slice idiom).

The reference computes per-block index arrays worker-side
(``nums/core/systems/numpy_compute.py:188-201``); round 1 instead fetched
the ENTIRE condition array to host (GB-scale transfer through a
~20ms/fetch tunnel on a 2^24-row mask). Here the only host sync is ONE
scalar (the true-count): index arrays are built on device with
``jnp.nonzero(size=capacity)`` and sliced to the exact count. Capacities
are rounded to powers of two so the jit cache sees O(log n) distinct
programs instead of one per count.

Pads of at-rest buffers are never read: kernels slice to the logical
shape first (garbage pads would otherwise count as True).
"""

import functools

import jax
import jax.numpy as jnp


def _logical(x, logical_shape, transposed):
    if tuple(x.shape) != tuple(logical_shape):
        x = x[tuple(slice(0, d) for d in logical_shape)]
    return jnp.transpose(x) if transposed else x


@functools.lru_cache(maxsize=None)
def count_nonzero(logical_shape: tuple, transposed: bool = False):
    return jax.jit(
        lambda x: jnp.count_nonzero(_logical(x, logical_shape, transposed))
    )


@functools.lru_cache(maxsize=None)
def nonzero_capped(logical_shape: tuple, cap: int, transposed: bool = False):
    """Index arrays of the True positions, padded to ``cap`` entries.

    Fill values index position 0 (valid everywhere) — callers slice to
    the exact count, so fills are never observed.
    """
    return jax.jit(
        lambda x: jnp.nonzero(
            _logical(x, logical_shape, transposed), size=cap, fill_value=0
        )
    )


def capacity_for(count: int) -> int:
    """Next power of two (>=1): bounds distinct compiled programs."""
    return 1 << max(0, (int(count) - 1)).bit_length() if count > 0 else 0


def device_where(mask_block_array):
    """(count, index jax.Arrays): device-resolved np.where semantics.

    One scalar host sync for the count; index arrays stay on device and
    are already sliced to exact length.
    """
    raw = mask_block_array.raw
    logical = mask_block_array._raw_logical_shape()
    t = mask_block_array.is_transposed
    count = int(count_nonzero(logical, t)(raw))
    if count == 0:
        ndim = len(mask_block_array.shape)
        return 0, tuple(jnp.zeros((0,), jnp.int64) for _ in range(ndim))
    cap = capacity_for(count)
    idx = nonzero_capped(logical, cap, t)(raw)
    if cap != count:
        idx = tuple(i[:count] for i in idx)
    return count, tuple(idx)
