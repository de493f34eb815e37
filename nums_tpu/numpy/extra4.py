"""Fifth tranche: NumPy's in-place mutation family.

NumPy mutates the array argument; BlockArrays are functional wrappers
around immutable device buffers, so these rebind the wrapper's buffer —
exactly the semantics of ``BlockArray.__setitem__``. Scatter/update logic
runs on device via ``.at`` ops.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from nums_tpu.numpy.extra import _to_ba

__all__ = [
    "put", "put_along_axis", "place", "putmask", "copyto",
    "fill_diagonal", "apply_along_axis",
]


def _rebind(ba, data):
    # _store re-pads to the backend's at-rest rule (pad-and-mask).
    ba._store(data)


def put(a, ind, v):
    a = _to_ba(a)
    ind = jnp.asarray(np.asarray(_to_ba(ind).get(), dtype=int))
    v = _to_ba(v)

    @jax.jit
    def impl(x, idx, vals):
        flat = x.reshape(-1)
        vals = jnp.broadcast_to(jnp.ravel(vals), idx.shape)
        return flat.at[idx].set(vals).reshape(x.shape)

    _rebind(a, impl(a.data, ind, v.data))
    return None


def put_along_axis(arr, indices, values, axis):
    arr, indices, values = _to_ba(arr), _to_ba(indices), _to_ba(values)

    @functools.partial(jax.jit, static_argnames=("axis",))
    def impl(x, idx, vals, axis):
        vals = jnp.broadcast_to(vals, idx.shape)
        return jnp.put_along_axis(x, idx, vals, axis, inplace=False)

    _rebind(arr, impl(arr.data, indices.data, values.data, axis))
    return None


def place(arr, mask, vals):
    """NumPy semantics: cycle `vals` into the True positions of mask —
    data-dependent assignment ⇒ host round trip."""
    arr = _to_ba(arr)
    host = arr.get().copy()
    np.place(
        host, np.asarray(_to_ba(mask).get(), dtype=bool),
        np.asarray(_to_ba(vals).get()),
    )
    _rebind(arr, arr.backend.device_put(host, arr.grid))
    return None


def putmask(a, mask, values):
    a, mask, values = _to_ba(a), _to_ba(mask), _to_ba(values)

    @jax.jit
    def impl(x, m, v):
        v = jnp.broadcast_to(jnp.resize(v, x.shape), x.shape)
        return jnp.where(m, v, x)

    _rebind(a, impl(a.data, mask.data, values.data))
    return None


def copyto(dst, src):
    dst = _to_ba(dst)
    src = _to_ba(src)

    @jax.jit
    def impl(x, s):
        return jnp.broadcast_to(s, x.shape).astype(x.dtype)

    _rebind(dst, impl(dst.data, src.data))
    return None


def fill_diagonal(a, val):
    a = _to_ba(a)

    @functools.partial(jax.jit, static_argnames=("val",))
    def impl(x, val):
        return jnp.fill_diagonal(x, val, inplace=False)

    if isinstance(val, (int, float, bool)):
        _rebind(a, impl(a.data, val))
    else:

        @jax.jit
        def impl_arr(x, v):
            return jnp.fill_diagonal(x, v, inplace=False)

        _rebind(a, impl_arr(a.data, _to_ba(val).data))
    return None


def apply_along_axis(func1d, axis, arr, *args, **kwargs):
    """Vectorize a 1-D jnp-compatible function over an axis (vmap)."""
    arr = _to_ba(arr)

    @functools.partial(jax.jit, static_argnames=("axis",))
    def impl(x, axis):
        return jnp.apply_along_axis(func1d, axis, x, *args, **kwargs)

    from nums_tpu.numpy.extra import _wrap

    return _wrap(arr, impl(arr.data, axis))