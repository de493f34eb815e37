"""Final compat tranche: repr/printing, dtype utilities, *_from index
variants, bit packing — the long tail of the numpy namespace."""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from nums_tpu.core.application_manager import instance as _instance
from nums_tpu.numpy.extra import _to_ba, _wrap, _jit_kw

__all__ = [
    "asarray_chkfinite", "ascontiguousarray", "asfortranarray",
    "isfortran", "resize", "packbits", "unpackbits", "histogramdd",
    "mask_indices", "tril_indices_from", "triu_indices_from",
    "diag_indices_from", "array_repr", "array_str", "array2string",
    "base_repr", "binary_repr", "typename", "min_scalar_type",
    "mintypecode", "common_type", "einsum_path", "get_printoptions",
    "set_printoptions", "printoptions", "array_equiv", "format_float_positional",
    "format_float_scientific", "fromfunction", "fromiter", "frombuffer",
    "fromstring",
]

# Pure-metadata / printing passthroughs.
base_repr = np.base_repr
binary_repr = np.binary_repr
typename = np.typename
min_scalar_type = np.min_scalar_type
mintypecode = np.mintypecode
get_printoptions = np.get_printoptions
set_printoptions = np.set_printoptions
printoptions = np.printoptions
format_float_positional = np.format_float_positional
format_float_scientific = np.format_float_scientific

from nums_tpu.numpy.extra3 import array_equiv  # noqa: E402,F401


def asarray_chkfinite(a, dtype=None):
    from nums_tpu.numpy import api as _api

    out = _api.asarray(a, dtype=dtype)
    if not bool(out.ufunc("isfinite").all()):
        raise ValueError("array must not contain infs or NaNs")
    return out


def ascontiguousarray(a, dtype=None):
    # Layout is XLA's concern; equivalent to asarray here.
    from nums_tpu.numpy import api as _api

    return _api.asarray(a, dtype=dtype)


def asfortranarray(a, dtype=None):
    from nums_tpu.numpy import api as _api

    return _api.asarray(a, dtype=dtype)


def isfortran(a):
    del a
    return False


def resize(a, new_shape):
    a = _to_ba(a)
    if isinstance(new_shape, int):
        new_shape = (new_shape,)

    @functools.partial(jax.jit, static_argnames=("new_shape",))
    def impl(x, new_shape):
        return jnp.resize(x, new_shape)

    return _wrap(a, impl(a.data, tuple(new_shape)))


def packbits(a, axis=None, bitorder="big"):
    a = _to_ba(a)
    return _wrap(a, _jit_kw("packbits", axis=axis, bitorder=bitorder)(a.data))


def unpackbits(a, axis=None, bitorder="big"):
    a = _to_ba(a)
    return _wrap(
        a, _jit_kw("unpackbits", axis=axis, bitorder=bitorder)(a.data)
    )


def histogramdd(sample, bins=10):
    sample = _to_ba(sample)

    @functools.partial(jax.jit, static_argnames=("bins",))
    def impl(x, bins):
        return jnp.histogramdd(x, bins=bins)

    h, edges = impl(sample.data, bins)
    return _wrap(sample, h), [_wrap(sample, e) for e in edges]


def mask_indices(n, mask_func, k=0):
    app = _instance()
    rows, cols = np.mask_indices(n, mask_func, k)
    return (
        app.array(rows, block_shape=rows.shape),
        app.array(cols, block_shape=cols.shape),
    )


def tril_indices_from(arr, k=0):
    from nums_tpu.numpy.extra2 import tril_indices

    arr = _to_ba(arr)
    return tril_indices(arr.shape[0], k, arr.shape[1])


def triu_indices_from(arr, k=0):
    from nums_tpu.numpy.extra2 import triu_indices

    arr = _to_ba(arr)
    return triu_indices(arr.shape[0], k, arr.shape[1])


def diag_indices_from(arr):
    from nums_tpu.numpy.extra2 import diag_indices

    arr = _to_ba(arr)
    return diag_indices(arr.shape[0], arr.ndim)


def array_repr(arr, *args, **kwargs):
    return np.array_repr(_to_ba(arr).get(), *args, **kwargs)


def array_str(a, *args, **kwargs):
    return np.array_str(_to_ba(a).get(), *args, **kwargs)


def array2string(a, *args, **kwargs):
    return np.array2string(_to_ba(a).get(), *args, **kwargs)


def common_type(*arrays):
    return np.common_type(
        *[np.empty(0, dtype=_to_ba(a).dtype) for a in arrays]
    )


def fromfunction(function, shape, dtype=float):
    @functools.partial(jax.jit, static_argnames=("shape",))
    def impl(shape):
        return jnp.fromfunction(function, shape, dtype=dtype)

    out = impl(tuple(shape))
    from nums_tpu.core.array.blockarray import BlockArray

    return BlockArray.from_jax(out, backend=_instance().backend)


def fromiter(iterable, dtype, count=-1):
    out = np.fromiter(iterable, dtype, count)
    return _instance().array(out, block_shape=out.shape)


def frombuffer(buffer, dtype=float, count=-1, offset=0):
    out = np.frombuffer(buffer, dtype, count, offset)
    return _instance().array(out, block_shape=out.shape)


def fromstring(string, dtype=float, sep=" "):
    out = np.array(
        [np.dtype(dtype).type(v) for v in string.split(sep) if v],
        dtype=dtype,
    )
    return _instance().array(out, block_shape=out.shape)


def einsum_path(subscripts, *operands, optimize="greedy"):
    return np.einsum_path(
        subscripts,
        *[np.empty(_to_ba(o).shape) for o in operands],
        optimize=optimize,
    )