"""Shape/dtype helpers for the array layer.

Parity: ``nums/core/array/utils.py:27-241`` — dtype inference via
1-element probes, broadcast helpers, index translation. Most of the
reference's helpers exist because it manages per-block metadata by hand;
here jax computes result shapes/dtypes, so this module keeps only what the
block-metadata policy still needs.
"""

import numpy as np


def broadcast_shape(shape_a: tuple, shape_b: tuple) -> tuple:
    return tuple(np.broadcast_shapes(shape_a, shape_b))


def can_broadcast_shapes(shape_a: tuple, shape_b: tuple) -> bool:
    try:
        np.broadcast_shapes(shape_a, shape_b)
        return True
    except ValueError:
        return False


def broadcast_block_shape(
    result_shape: tuple,
    shape_a: tuple,
    bs_a: tuple,
    shape_b: tuple,
    bs_b: tuple,
) -> tuple:
    """Block shape of an elementwise result under NumPy broadcasting.

    Mirrors the policy of ``_broadcast_bop`` (application.py:715-737): the
    result inherits blocking from whichever operand actually spans each
    result axis (size > 1 there), preferring the higher-rank operand.
    """
    ndim = len(result_shape)
    # Right-align operand axes with result axes.
    pad_a = ndim - len(shape_a)
    pad_b = ndim - len(shape_b)
    out = []
    for i, dim in enumerate(result_shape):
        cand = None
        ia = i - pad_a
        ib = i - pad_b
        a_spans = ia >= 0 and shape_a[ia] == dim and dim != 0
        b_spans = ib >= 0 and shape_b[ib] == dim and dim != 0
        if a_spans and (len(shape_a) >= len(shape_b) or not b_spans):
            cand = bs_a[ia]
        elif b_spans:
            cand = bs_b[ib]
        if cand is None or cand == 0:
            cand = dim
        out.append(min(cand, dim) if dim > 0 else 0)
    return tuple(out)


def reduced_block_shape(block_shape: tuple, axis, keepdims: bool) -> tuple:
    if axis is None:
        return tuple(1 for _ in block_shape) if keepdims else ()
    axes = (axis,) if isinstance(axis, int) else tuple(axis)
    axes = tuple(a % len(block_shape) for a in axes)
    out = []
    for i, b in enumerate(block_shape):
        if i in axes:
            if keepdims:
                out.append(1)
        else:
            out.append(b)
    return tuple(out)


def tensordot_block_shape(bs_a: tuple, bs_b: tuple, axes: int) -> tuple:
    if axes == 0:
        return tuple(bs_a) + tuple(bs_b)
    return tuple(bs_a[:-axes]) + tuple(bs_b[axes:])


def default_block_shape_for(shape: tuple, old_block_shape: tuple = None) -> tuple:
    if old_block_shape is not None and len(old_block_shape) == len(shape):
        return tuple(min(b, s) for b, s in zip(old_block_shape, shape))
    return tuple(shape)


def to_dtype_name(dtype) -> str:
    """Canonical string name for a dtype-like (np/jnp dtype, python type)."""
    if dtype is None:
        return None
    if dtype is float:
        return "float64"
    if dtype is int:
        return "int64"
    if dtype is bool:
        return "bool"
    return np.dtype(dtype).name


def to_np_dtype(dtype):
    if dtype is float:
        return np.dtype(np.float64)
    if dtype is int:
        return np.dtype(np.int64)
    if dtype is bool:
        return np.dtype(np.bool_)
    return np.dtype(dtype)


def is_scalar_like(x) -> bool:
    return isinstance(x, (bool, int, float, complex, np.generic)) or (
        isinstance(x, np.ndarray) and x.ndim == 0
    )


def shape_from_block_shape(shape: tuple, block_shape: tuple) -> tuple:
    """grid shape implied by (shape, block_shape)."""
    return tuple(-(-s // b) if s > 0 else 1 for s, b in zip(shape, block_shape))
