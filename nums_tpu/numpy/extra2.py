"""Third facade tranche: predicates, nan-variants, windows, index utils,
polynomials. Same machinery as ``extra.py`` (jitted XLA kernels over
BlockArray; host sync only where output shape is data-dependent)."""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from nums_tpu.core.application_manager import instance as _instance
from nums_tpu.numpy.extra import _to_ba, _wrap, _jit_kw

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


def frexp(x):
    x = _to_ba(x)

    @jax.jit
    def impl(v):
        return jnp.frexp(v)

    m, e = impl(x.data)
    return _wrap(x, m, x.block_shape), _wrap(x, e, x.block_shape)


def isin(element, test_elements):
    element, test = _to_ba(element), _to_ba(test_elements)

    @jax.jit
    def impl(e, t):
        return jnp.isin(e, t)

    return _wrap(element, impl(element.data, test.data),
                 element.block_shape)


def isreal(x):
    x = _to_ba(x)
    return _wrap(x, _jit_kw("isreal")(x.data), x.block_shape)


def iscomplex(x):
    x = _to_ba(x)
    return _wrap(x, _jit_kw("iscomplex")(x.data), x.block_shape)


def isneginf(x):
    x = _to_ba(x)
    return _wrap(x, _jit_kw("isneginf")(x.data), x.block_shape)


def isposinf(x):
    x = _to_ba(x)
    return _wrap(x, _jit_kw("isposinf")(x.data), x.block_shape)


def isrealobj(x):
    return not np.issubdtype(_to_ba(x).dtype, np.complexfloating)


def iscomplexobj(x):
    return np.issubdtype(_to_ba(x).dtype, np.complexfloating)


def _unary_axis(fname):
    def fn(a, axis=None):
        a = _to_ba(a)
        return _wrap(a, _jit_kw(fname, axis=axis)(a.data))

    fn.__name__ = fname
    return fn


nanargmax = _unary_axis("nanargmax")
nanargmin = _unary_axis("nanargmin")
nancumsum = _unary_axis("nancumsum")
nancumprod = _unary_axis("nancumprod")
nanprod = _unary_axis("nanprod")


def nanpercentile(a, q, axis=None):
    a = _to_ba(a)
    qt = tuple(np.atleast_1d(q).tolist())

    @functools.partial(jax.jit, static_argnames=("qt", "axis"))
    def impl(x, qt, axis):
        return jnp.nanpercentile(x, jnp.asarray(qt), axis=axis)

    out = impl(a.data, qt, axis)
    if np.isscalar(q):
        out = out[0]
    return _wrap(a, out)


def nanquantile(a, q, axis=None):
    a = _to_ba(a)
    qt = tuple(np.atleast_1d(q).tolist())

    @functools.partial(jax.jit, static_argnames=("qt", "axis"))
    def impl(x, qt, axis):
        return jnp.nanquantile(x, jnp.asarray(qt), axis=axis)

    out = impl(a.data, qt, axis)
    if np.isscalar(q):
        out = out[0]
    return _wrap(a, out)


def take_along_axis(arr, indices, axis):
    arr, indices = _to_ba(arr), _to_ba(indices)

    @functools.partial(jax.jit, static_argnames=("axis",))
    def impl(a, idx, axis):
        return jnp.take_along_axis(a, idx, axis=axis)

    return _wrap(arr, impl(arr.data, indices.data, axis))


def select(condlist, choicelist, default=0):
    conds = [_to_ba(c) for c in condlist]
    choices = [_to_ba(c) for c in choicelist]
    datas = tuple(c.data for c in conds) + tuple(c.data for c in choices)
    k = len(conds)

    @functools.partial(jax.jit, static_argnames=("k", "default"))
    def impl(k, default, *ds):
        return jnp.select(list(ds[:k]), list(ds[k:]), default=default)

    return _wrap(conds[0], impl(k, default, *datas))


def unravel_index(indices, shape):
    indices = _to_ba(indices)

    @functools.partial(jax.jit, static_argnames=("shape",))
    def impl(idx, shape):
        return jnp.unravel_index(idx, shape)

    outs = impl(indices.data, tuple(shape))
    return tuple(_wrap(indices, o) for o in outs)


def ravel_multi_index(multi_index, dims):
    bas = [_to_ba(m) for m in multi_index]

    @functools.partial(jax.jit, static_argnames=("dims",))
    def impl(dims, *idx):
        # mode='raise' needs concrete indices; 'wrap' keeps it jittable.
        return jnp.ravel_multi_index(idx, dims, mode="wrap")

    return _wrap(bas[0], impl(tuple(dims), *[b.data for b in bas]))


def _index_pair(np_fn, *args, **kwargs):
    app = _instance()
    rows, cols = np_fn(*args, **kwargs)
    return (
        app.array(rows, block_shape=rows.shape),
        app.array(cols, block_shape=cols.shape),
    )


def tril_indices(n, k=0, m=None):
    return _index_pair(np.tril_indices, n, k, m)


def triu_indices(n, k=0, m=None):
    return _index_pair(np.triu_indices, n, k, m)


def diag_indices(n, ndim=2):
    app = _instance()
    out = np.diag_indices(n, ndim)
    return tuple(app.array(o, block_shape=o.shape) for o in out)


def indices(dimensions, dtype=None):
    app = _instance()
    out = np.indices(dimensions, dtype=dtype or np.int64)
    return app.array(out, block_shape=out.shape)


def polyval(p, x):
    p, x = _to_ba(p), _to_ba(x)

    @jax.jit
    def impl(pp, xx):
        return jnp.polyval(pp, xx)

    return _wrap(x, impl(p.data, x.data))


def polyfit(x, y, deg):
    x, y = _to_ba(x), _to_ba(y)

    @functools.partial(jax.jit, static_argnames=("deg",))
    def impl(xx, yy, deg):
        return jnp.polyfit(xx, yy, deg)

    return _wrap(x, impl(x.data, y.data, int(deg)))


def unwrap(p, axis=-1):
    p = _to_ba(p)
    return _wrap(p, _jit_kw("unwrap", axis=axis)(p.data), p.block_shape)


def _window(fname):
    def fn(M):
        app = _instance()
        out = np.asarray(getattr(np, fname)(M))
        return app.array(out, block_shape=out.shape)

    fn.__name__ = fname
    fn.__doc__ = f"{fname} window (host-computed constants, device-resident)."
    return fn


hamming = _window("hamming")
hanning = _window("hanning")
blackman = _window("blackman")
bartlett = _window("bartlett")


def kaiser(M, beta):
    app = _instance()
    out = np.kaiser(M, beta)
    return app.array(out, block_shape=out.shape)


def i0(x):
    x = _to_ba(x)
    return _wrap(x, _jit_kw("i0")(x.data), x.block_shape)


def histogram_bin_edges(a, bins=10, range=None):  # noqa: A002
    a = _to_ba(a)

    @functools.partial(jax.jit, static_argnames=("bins", "range"))
    def impl(x, bins, range):
        return jnp.histogram_bin_edges(x, bins=bins, range=range)

    return _wrap(a, impl(a.data, bins, range))


def histogram2d(x, y, bins=10):
    x, y = _to_ba(x), _to_ba(y)

    @functools.partial(jax.jit, static_argnames=("bins",))
    def impl(xx, yy, bins):
        return jnp.histogram2d(xx, yy, bins=bins)

    h, ex, ey = impl(x.data, y.data, bins)
    return _wrap(x, h), _wrap(x, ex), _wrap(x, ey)