"""Third facade tranche: predicates, nan-variants, windows, index utils,
polynomials. Same machinery as ``extra.py``: module-level cached jitted
kernels routed through the pad-and-mask + lazy adapter (``_call``); host
sync only where output shape is data-dependent."""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from nums_tpu.core.application_manager import instance as _instance
from nums_tpu.numpy.extra import _to_ba, _wrap, _wrapc, _call, _jit_kw

__all__ = [
    "isin", "isreal", "iscomplex", "isneginf", "isposinf", "isrealobj",
    "iscomplexobj", "nanargmax", "nanargmin", "nancumsum", "nancumprod",
    "nanprod", "nanpercentile", "nanquantile", "take_along_axis", "select",
    "unravel_index", "ravel_multi_index", "tril_indices", "triu_indices",
    "diag_indices", "indices", "polyval", "polyfit", "unwrap", "hamming",
    "hanning", "blackman", "bartlett", "kaiser", "i0",
    "histogram_bin_edges", "histogram2d", "hypot", "heaviside",
    "float_power", "copysign", "frexp", "ldexp", "signbit", "spacing",
]

# already-exported ufuncs referenced above come from api.py; re-export for
# anyone importing from this module directly.
from nums_tpu.numpy.api import (  # noqa: E402,F401
    hypot, heaviside, float_power, copysign, ldexp, signbit, spacing,
)


_k_frexp = jax.jit(lambda v: jnp.frexp(v))


def frexp(x):
    x = _to_ba(x)
    (m, e), (m_l, e_l) = _call(_k_frexp, x)
    return (
        _wrap(x, m, x.block_shape, shape=m_l),
        _wrap(x, e, x.block_shape, shape=e_l),
    )


_k_isin = jax.jit(lambda e, t: jnp.isin(e, t))


def isin(element, test_elements):
    element, test = _to_ba(element), _to_ba(test_elements)
    return _wrapc(element, _call(_k_isin, element, test),
                  element.block_shape)


def _unary_same_shape(fname):
    def fn(x):
        x = _to_ba(x)
        return _wrapc(x, _call(_jit_kw(fname), x), x.block_shape)

    fn.__name__ = fname
    return fn


isreal = _unary_same_shape("isreal")
iscomplex = _unary_same_shape("iscomplex")
isneginf = _unary_same_shape("isneginf")
isposinf = _unary_same_shape("isposinf")
i0 = _unary_same_shape("i0")


def isrealobj(x):
    return not np.issubdtype(_to_ba(x).dtype, np.complexfloating)


def iscomplexobj(x):
    return np.issubdtype(_to_ba(x).dtype, np.complexfloating)


def _unary_axis(fname):
    def fn(a, axis=None):
        a = _to_ba(a)
        return _wrapc(a, _call(_jit_kw(fname, axis=axis), a))

    fn.__name__ = fname
    return fn


nanargmax = _unary_axis("nanargmax")
nanargmin = _unary_axis("nanargmin")
nancumsum = _unary_axis("nancumsum")
nancumprod = _unary_axis("nancumprod")
nanprod = _unary_axis("nanprod")


@functools.lru_cache(maxsize=None)
def _k_nanquantile_like(fname, qt, axis, squeeze0):
    fn = getattr(jnp, fname)

    def impl(x):
        out = fn(x, jnp.asarray(qt), axis=axis)
        return out[0] if squeeze0 else out

    return jax.jit(impl)


def nanpercentile(a, q, axis=None):
    a = _to_ba(a)
    qt = tuple(np.atleast_1d(q).tolist())
    kernel = _k_nanquantile_like("nanpercentile", qt, axis, np.isscalar(q))
    return _wrapc(a, _call(kernel, a))


def nanquantile(a, q, axis=None):
    a = _to_ba(a)
    qt = tuple(np.atleast_1d(q).tolist())
    kernel = _k_nanquantile_like("nanquantile", qt, axis, np.isscalar(q))
    return _wrapc(a, _call(kernel, a))


@functools.lru_cache(maxsize=None)
def _k_take_along_axis(axis):
    return jax.jit(lambda a, idx: jnp.take_along_axis(a, idx, axis=axis))


def take_along_axis(arr, indices, axis):
    arr, indices = _to_ba(arr), _to_ba(indices)
    return _wrapc(arr, _call(_k_take_along_axis(axis), arr, indices))


@functools.lru_cache(maxsize=None)
def _k_select(k, default):
    return jax.jit(
        lambda *ds: jnp.select(list(ds[:k]), list(ds[k:]), default=default)
    )


def select(condlist, choicelist, default=0):
    conds = [_to_ba(c) for c in condlist]
    choices = [_to_ba(c) for c in choicelist]
    kernel = _k_select(len(conds), default)
    return _wrapc(conds[0], _call(kernel, *(conds + choices)))


@functools.lru_cache(maxsize=None)
def _k_unravel_index(shape):
    return jax.jit(lambda idx: jnp.unravel_index(idx, shape))


def unravel_index(indices, shape):
    indices = _to_ba(indices)
    outs, lshapes = _call(_k_unravel_index(tuple(shape)), indices)
    return tuple(
        _wrap(indices, o, shape=ls) for o, ls in zip(outs, lshapes)
    )


@functools.lru_cache(maxsize=None)
def _k_ravel_multi_index(dims):
    # mode='raise' needs concrete indices; 'wrap' keeps it jittable.
    return jax.jit(
        lambda *idx: jnp.ravel_multi_index(idx, dims, mode="wrap")
    )


def ravel_multi_index(multi_index, dims):
    bas = [_to_ba(m) for m in multi_index]
    return _wrapc(bas[0], _call(_k_ravel_multi_index(tuple(dims)), *bas))


def _wrap_index_arrays(arrays):
    """Device-built index tuples -> BlockArrays (no host constant)."""
    from nums_tpu.core.array.blockarray import BlockArray

    backend = _instance().backend
    return tuple(
        BlockArray.from_jax(a, backend=backend) for a in arrays
    )


@functools.lru_cache(maxsize=None)
def _k_index_builder(fname, *args):
    fn = getattr(jnp, fname)
    return jax.jit(lambda: fn(*args))


def tril_indices(n, k=0, m=None):
    """Built ON DEVICE (jnp iota/nonzero with static shapes)."""
    return _wrap_index_arrays(
        _k_index_builder("tril_indices", int(n), int(k),
                         None if m is None else int(m))()
    )


def triu_indices(n, k=0, m=None):
    return _wrap_index_arrays(
        _k_index_builder("triu_indices", int(n), int(k),
                         None if m is None else int(m))()
    )


def diag_indices(n, ndim=2):
    return _wrap_index_arrays(
        _k_index_builder("diag_indices", int(n), int(ndim))()
    )


def indices(dimensions, dtype=None):
    from nums_tpu.core.array.blockarray import BlockArray

    dt = np.dtype(dtype or np.int64)
    data = _k_indices(tuple(int(d) for d in dimensions), dt.name)()
    return BlockArray.from_jax(data, backend=_instance().backend)


@functools.lru_cache(maxsize=None)
def _k_indices(dims, dname):
    return jax.jit(lambda: jnp.indices(dims).astype(np.dtype(dname)))


_k_polyval = jax.jit(lambda pp, xx: jnp.polyval(pp, xx))


def polyval(p, x):
    p, x = _to_ba(p), _to_ba(x)
    return _wrapc(x, _call(_k_polyval, p, x))


@functools.lru_cache(maxsize=None)
def _k_polyfit(deg):
    return jax.jit(lambda xx, yy: jnp.polyfit(xx, yy, deg))


def polyfit(x, y, deg):
    x, y = _to_ba(x), _to_ba(y)
    return _wrapc(x, _call(_k_polyfit(int(deg)), x, y))


def unwrap(p, axis=-1):
    p = _to_ba(p)
    return _wrapc(p, _call(_jit_kw("unwrap", axis=axis), p), p.block_shape)


def _window(fname):
    def fn(M):
        from nums_tpu.core.array.blockarray import BlockArray

        data = _k_index_builder(fname, int(M))()
        return BlockArray.from_jax(data, backend=_instance().backend)

    fn.__name__ = fname
    fn.__doc__ = f"{fname} window, computed ON DEVICE (jnp.{fname})."
    return fn


hamming = _window("hamming")
hanning = _window("hanning")
blackman = _window("blackman")
bartlett = _window("bartlett")


def kaiser(M, beta):
    from nums_tpu.core.array.blockarray import BlockArray

    data = _k_index_builder("kaiser", int(M), float(beta))()
    return BlockArray.from_jax(data, backend=_instance().backend)


@functools.lru_cache(maxsize=None)
def _k_histogram_bin_edges(bins, range):  # noqa: A002
    return jax.jit(
        lambda x: jnp.histogram_bin_edges(x, bins=bins, range=range)
    )


def histogram_bin_edges(a, bins=10, range=None):  # noqa: A002
    a = _to_ba(a)
    return _wrapc(a, _call(_k_histogram_bin_edges(bins, range), a))


@functools.lru_cache(maxsize=None)
def _k_histogram2d(bins):
    return jax.jit(lambda xx, yy: tuple(jnp.histogram2d(xx, yy, bins=bins)))


def histogram2d(x, y, bins=10):
    x, y = _to_ba(x), _to_ba(y)
    (h, ex, ey), (h_l, ex_l, ey_l) = _call(_k_histogram2d(bins), x, y)
    return (
        _wrap(x, h, shape=h_l),
        _wrap(x, ex, shape=ex_l),
        _wrap(x, ey, shape=ey_l),
    )
