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

from nums_tpu.numpy.extra import _to_ba, _call

__all__ = [
    "put", "put_along_axis", "place", "putmask", "copyto",
    "fill_diagonal", "apply_along_axis",
]


def _rebind(ba, data):
    # _store re-pads to the backend's at-rest rule (pad-and-mask).
    ba._store(data)


_k_put = jax.jit(
    lambda x, idx, vals: x.reshape(-1)
    .at[idx]
    .set(jnp.broadcast_to(jnp.ravel(vals), idx.shape))
    .reshape(x.shape)
)


def put(a, ind, v):
    a = _to_ba(a)
    ind = jnp.asarray(np.asarray(_to_ba(ind).get(), dtype=int))
    v = _to_ba(v)
    data, _ = _call(_k_put, a, ind, v)
    _rebind(a, data)
    return None


@functools.lru_cache(maxsize=None)
def _k_put_along_axis(axis):
    return jax.jit(
        lambda x, idx, vals: jnp.put_along_axis(
            x, idx, jnp.broadcast_to(vals, idx.shape), axis, inplace=False
        )
    )


def put_along_axis(arr, indices, values, axis):
    arr, indices, values = _to_ba(arr), _to_ba(indices), _to_ba(values)
    data, _ = _call(_k_put_along_axis(axis), arr, indices, values)
    _rebind(arr, data)
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


_k_putmask = jax.jit(
    lambda x, m, v: jnp.where(
        m, jnp.broadcast_to(jnp.resize(v, x.shape), x.shape), x
    )
)


def putmask(a, mask, values):
    a, mask, values = _to_ba(a), _to_ba(mask), _to_ba(values)
    data, _ = _call(_k_putmask, a, mask, values)
    _rebind(a, data)
    return None


_k_copyto = jax.jit(
    lambda x, s: jnp.broadcast_to(s, x.shape).astype(x.dtype)
)


def copyto(dst, src):
    dst = _to_ba(dst)
    src = _to_ba(src)
    data, _ = _call(_k_copyto, dst, src)
    _rebind(dst, data)
    return None


_k_fill_diagonal = jax.jit(
    lambda x, v: jnp.fill_diagonal(x, v, inplace=False)
)


def fill_diagonal(a, val):
    a = _to_ba(a)
    if isinstance(val, (int, float, bool)):
        data, _ = _call(_k_fill_diagonal, a, val)
    else:
        data, _ = _call(_k_fill_diagonal, a, _to_ba(val))
    _rebind(a, data)
    return None


def apply_along_axis(func1d, axis, arr, *args, **kwargs):
    """Vectorize a 1-D jnp-compatible function over an axis (vmap)."""
    arr = _to_ba(arr)

    @functools.partial(jax.jit, static_argnames=("axis",))
    def impl(x, axis):
        return jnp.apply_along_axis(func1d, axis, x, *args, **kwargs)

    from nums_tpu.numpy.extra import _wrap

    return _wrap(arr, impl(arr.data, axis))