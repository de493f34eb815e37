"""Fourth facade tranche: set operations, polynomial arithmetic,
partitioning, block assembly. Host-sync only for data-dependent shapes
(set ops, unique_*), metadata passthroughs for dtype predicates."""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from nums_tpu.core.application_manager import instance as _instance
from nums_tpu.numpy.extra import _to_ba, _wrap, _wrapc, _call, _jit_kw

__all__ = [
    "argpartition", "partition", "lexsort", "modf", "rot90", "rollaxis",
    "vecdot", "block", "choose", "delete", "insert", "array_equiv",
    "in1d", "intersect1d", "setdiff1d", "setxor1d", "union1d",
    "unique_all", "unique_counts", "unique_inverse", "unique_values",
    "trim_zeros", "sort_complex", "polyadd", "polysub", "polymul",
    "polydiv", "polyder", "polyint", "poly", "roots", "issubdtype",
    "isdtype", "iterable", "real_if_close",
]

issubdtype = np.issubdtype
isdtype = getattr(np, "isdtype", None) or np.issubdtype
iterable = np.iterable


def argpartition(a, kth, axis=-1):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("argpartition", kth=kth, axis=axis), a))


def partition(a, kth, axis=-1):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("partition", kth=kth, axis=axis), a))


@functools.lru_cache(maxsize=None)
def _k_lexsort(axis, n):
    del n
    return jax.jit(lambda *ks: jnp.lexsort(ks, axis=axis))


def lexsort(keys, axis=-1):
    bas = [_to_ba(k) for k in keys]
    return _wrapc(bas[0], _call(_k_lexsort(axis, len(bas)), *bas))


_k_modf = jax.jit(lambda v: jnp.modf(v))


def modf(x):
    x = _to_ba(x)
    (frac, whole), (f_l, w_l) = _call(_k_modf, x)
    return (
        _wrap(x, frac, x.block_shape, shape=f_l),
        _wrap(x, whole, x.block_shape, shape=w_l),
    )


def rot90(m, k=1, axes=(0, 1)):
    m = _to_ba(m)
    return _wrapc(m, _call(_jit_kw("rot90", k=k, axes=tuple(axes)), m))


def rollaxis(a, axis, start=0):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("rollaxis", axis=axis, start=start), a))


@functools.lru_cache(maxsize=None)
def _k_vecdot(axis):
    return jax.jit(lambda a, b: jnp.vecdot(a, b, axis=axis))


def vecdot(x1, x2, axis=-1):
    x1, x2 = _to_ba(x1), _to_ba(x2)
    return _wrapc(x1, _call(_k_vecdot(axis), x1, x2))


def block(arrays):
    def conv(obj):
        if isinstance(obj, list):
            return [conv(o) for o in obj]
        return _to_ba(obj).data

    datas = conv(arrays)
    first = datas
    while isinstance(first, list):
        first = first[0]
    out = jnp.block(datas)
    from nums_tpu.core.array.blockarray import BlockArray

    return BlockArray.from_jax(out, backend=_instance().backend)


_k_choose = jax.jit(lambda idx, *cs: jnp.choose(idx, list(cs), mode="clip"))


def choose(a, choices):
    a = _to_ba(a)
    ch = [_to_ba(c) for c in choices]
    return _wrapc(a, _call(_k_choose, a, *ch))


def delete(arr, obj, axis=None):
    arr = _to_ba(arr)
    if isinstance(obj, (int, np.integer, slice)):
        return _wrapc(arr, _call(_jit_kw("delete", obj=obj, axis=axis), arr))
    # array-valued indices: data-dependent -> host
    out = np.delete(arr.get(), np.asarray(_to_ba(obj).get(), dtype=int),
                    axis=axis)
    return _instance().array(out, block_shape=None)


def insert(arr, obj, values, axis=None):
    arr = _to_ba(arr)
    out = np.insert(
        arr.get(), obj,
        values.get() if hasattr(values, "get") else values, axis=axis,
    )
    return _instance().array(out, block_shape=None)


_k_array_equiv = jax.jit(lambda x, y: jnp.all(x == y))


def array_equiv(a1, a2):
    a1, a2 = _to_ba(a1), _to_ba(a2)
    try:
        np.broadcast_shapes(a1.shape, a2.shape)
    except ValueError:
        return _instance().scalar(False)

    return _wrapc(a1, _call(_k_array_equiv, a1, a2))


# -- set operations (data-dependent shapes ⇒ host sync, like where()) ----


def in1d(ar1, ar2):
    from nums_tpu.numpy.extra2 import isin
    from nums_tpu.numpy.extra import ravel

    return isin(ravel(_to_ba(ar1)), _to_ba(ar2))


def _host_setop(np_fn, *arrays):
    outs = np_fn(*[np.asarray(_to_ba(a).get()) for a in arrays])
    app = _instance()
    if isinstance(outs, tuple):
        return tuple(app.array(o, block_shape=o.shape) for o in outs)
    return app.array(outs, block_shape=outs.shape)


def intersect1d(ar1, ar2):
    return _host_setop(np.intersect1d, ar1, ar2)


def setdiff1d(ar1, ar2):
    return _host_setop(np.setdiff1d, ar1, ar2)


def setxor1d(ar1, ar2):
    return _host_setop(np.setxor1d, ar1, ar2)


def union1d(ar1, ar2):
    return _host_setop(np.union1d, ar1, ar2)


def unique_values(x):
    return _host_setop(np.unique, x)


def unique_counts(x):
    out = np.unique_counts(np.asarray(_to_ba(x).get()))
    app = _instance()
    return type(out)(
        app.array(out.values, block_shape=out.values.shape),
        app.array(out.counts, block_shape=out.counts.shape),
    )


def unique_inverse(x):
    out = np.unique_inverse(np.asarray(_to_ba(x).get()))
    app = _instance()
    return type(out)(
        app.array(out.values, block_shape=out.values.shape),
        app.array(out.inverse_indices,
                  block_shape=out.inverse_indices.shape),
    )


def unique_all(x):
    out = np.unique_all(np.asarray(_to_ba(x).get()))
    app = _instance()
    return type(out)(
        app.array(out.values, block_shape=out.values.shape),
        app.array(out.indices, block_shape=out.indices.shape),
        app.array(out.inverse_indices,
                  block_shape=out.inverse_indices.shape),
        app.array(out.counts, block_shape=out.counts.shape),
    )


def trim_zeros(filt, trim="fb"):
    out = np.trim_zeros(np.asarray(_to_ba(filt).get()), trim)
    return _instance().array(out, block_shape=out.shape)


def sort_complex(a):
    out = np.sort_complex(np.asarray(_to_ba(a).get()))
    return _instance().array(out, block_shape=out.shape)


# -- polynomials ---------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _k_poly_bop(fname):
    fn = getattr(jnp, fname)
    return jax.jit(lambda x, y: fn(x, y))


def _poly_bop(fname):
    def fn(a1, a2):
        a1, a2 = _to_ba(a1), _to_ba(a2)
        return _wrapc(a1, _call(_k_poly_bop(fname), a1, a2))

    fn.__name__ = fname
    return fn


polyadd = _poly_bop("polyadd")
polysub = _poly_bop("polysub")
polymul = _poly_bop("polymul")


_k_polydiv = jax.jit(lambda x, y: jnp.polydiv(x, y))


def polydiv(u, v):
    u, v = _to_ba(u), _to_ba(v)
    (q, r), (q_l, r_l) = _call(_k_polydiv, u, v)
    return _wrap(u, q, shape=q_l), _wrap(u, r, shape=r_l)


def polyder(p, m=1):
    p = _to_ba(p)
    return _wrapc(p, _call(_jit_kw("polyder", m=m), p))


def polyint(p, m=1):
    p = _to_ba(p)
    return _wrapc(p, _call(_jit_kw("polyint", m=m), p))


def poly(seq_of_zeros):
    out = np.poly(np.asarray(_to_ba(seq_of_zeros).get()))
    return _instance().array(out, block_shape=out.shape)


def roots(p):
    # Polynomial root-finding needs a general eig — host NumPy.
    out = np.roots(np.asarray(_to_ba(p).get()))
    return _instance().array(out, block_shape=out.shape)


def real_if_close(a, tol=100):
    out = np.real_if_close(np.asarray(_to_ba(a).get()), tol=tol)
    return _instance().array(out, block_shape=out.shape)