"""Array creation kernels, compiled straight into their target sharding.

Replaces the reference's driver loop of one ``new_block`` task per grid
entry (``ArrayApplication._new_array``, application.py:315-330 — the classic
NumS driver bottleneck): creation is a single jitted program whose
``out_shardings`` places shards directly in device HBM, with no host copy
and no per-block Python dispatch.
"""

import functools

import jax
import jax.numpy as jnp

_CREATORS = {
    "zeros": jnp.zeros,
    "ones": jnp.ones,
    # XLA has no uninitialized-alloc; empty = zeros (same cost under fusion).
    "empty": jnp.empty,
}


def _pad_phys(out, pshape):
    """Zero-pad a logical-shape value to the at-rest (padded) shape.

    EVERY creation kernel routes through this so the global invariant
    "at-rest pads are ZERO" holds regardless of which op built the
    array — the hand-scheduled collective matmuls (ops/summa.py) and any
    pad-blind contraction depend on it. Generating ones/full/arange/eye
    directly at the padded shape would leave NON-zero pads (advisor
    round-3 high finding: ragged ones() under collective matmul).
    """
    if pshape is None or tuple(pshape) == tuple(out.shape):
        return out
    return jnp.pad(out, [(0, p - s) for p, s in zip(pshape, out.shape)])


@functools.lru_cache(maxsize=None)
def new_array(op_name: str, shape: tuple, dtype_name: str, sharding,
              pshape: tuple = None):
    creator = _CREATORS[op_name]
    dtype = jnp.dtype(dtype_name)
    return jax.jit(
        lambda: _pad_phys(creator(shape, dtype), pshape),
        out_shardings=sharding,
    )


@functools.lru_cache(maxsize=None)
def full(shape: tuple, dtype_name: str, sharding, pshape: tuple = None):
    dtype = jnp.dtype(dtype_name)
    return jax.jit(
        lambda fill: _pad_phys(jnp.full(shape, fill, dtype), pshape),
        out_shardings=sharding,
    )


@functools.lru_cache(maxsize=None)
def arange(start, stop, step, dtype_name: str, sharding,
           pshape: tuple = None):
    """Parity: ``arange`` kernel (numpy_compute.py:176-179)."""
    dtype = jnp.dtype(dtype_name)
    return jax.jit(
        lambda: _pad_phys(jnp.arange(start, stop, step, dtype), pshape),
        out_shardings=sharding,
    )


@functools.lru_cache(maxsize=None)
def eye(shape: tuple, k: int, dtype_name: str, sharding,
        pshape: tuple = None):
    dtype = jnp.dtype(dtype_name)
    return jax.jit(
        lambda: _pad_phys(jnp.eye(shape[0], shape[1], k=k, dtype=dtype),
                          pshape),
        out_shardings=sharding,
    )


@functools.lru_cache(maxsize=None)
def linspace(num: int, endpoint: bool, dtype_name, axis: int, sharding,
             pshape: tuple = None):
    """linspace at the LOGICAL length, zero-padded to the at-rest shape
    (step depends on num, so generating at the padded length would be
    wrong — pad-and-mask instead; pads are never read)."""
    dtype = jnp.dtype(dtype_name) if dtype_name is not None else None

    def impl(start, stop):
        out = jnp.linspace(
            start, stop, num, endpoint=endpoint, dtype=dtype, axis=axis
        )
        if pshape is not None and tuple(pshape) != tuple(out.shape):
            out = jnp.pad(
                out, [(0, p - s) for p, s in zip(pshape, out.shape)]
            )
        return out

    return jax.jit(impl, out_shardings=sharding)


@jax.jit
def diag(x):
    """Vector→matrix or matrix→vector diagonal (parity: numpy_compute.py:171-174)."""
    return jnp.diag(x)
