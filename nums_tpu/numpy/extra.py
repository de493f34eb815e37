"""Extended NumPy surface beyond the reference's ~120 functions.

Every function here is a real jitted-XLA implementation over BlockArray
(not a host fallback): manipulation (stack/tile/roll/flip/sort...),
scan ops (cumsum/cumprod), predicates (all/any/isclose), nan-reductions,
and contraction helpers (dot/inner/outer/trace). Loaded into
``nums_tpu.numpy`` by its __init__.

All kernels are module-level lru-cached jits (static arguments baked
into the cache key — no per-call retrace), invoked through ``_call``,
which routes them via the pad-and-mask adapter (``ops/padded.call``):
ragged inputs get their at-rest padding sliced off INSIDE the kernel
(never a replicated intermediate), and with lazy batching on the result
joins the deferred expression DAG like any BlockArray operator.
"""

import builtins
import functools

import numpy as np

import jax
import jax.numpy as jnp

from nums_tpu.core.application_manager import instance as _instance
from nums_tpu.core.array.blockarray import BlockArray
from nums_tpu.core.array import utils as array_utils
from nums_tpu.core.grid import ArrayGrid
from nums_tpu.core.ops import padded


__all__ = [
    "prod", "all", "any", "cumsum", "cumprod", "nansum", "nanmean",
    "nanmax", "nanmin", "nanvar", "nanstd", "median", "nanmedian", "ptp",
    "count_nonzero", "average", "clip", "around", "round", "round_",
    "sort", "argsort", "searchsorted", "take", "stack", "vstack",
    "hstack", "dstack", "column_stack", "row_stack", "tile", "repeat",
    "roll", "flip", "fliplr", "flipud", "ravel", "swapaxes", "moveaxis",
    "atleast_1d", "atleast_2d", "broadcast_to", "triu", "tril", "dot",
    "inner", "outer", "trace", "vdot", "einsum", "kron",
    "matrix_transpose", "isclose", "array_equal", "real", "imag",
    "nan_to_num", "diff", "unique", "percentile", "quantile", "histogram",
    "cov", "corrcoef", "interp", "pad", "bincount", "argwhere",
    "flatnonzero", "nonzero", "meshgrid", "cross", "convolve", "correlate",
    "gradient", "trapezoid", "trapz", "sinc", "ediff1d", "vander", "tri",
    "full_like", "geomspace", "append", "array_split", "vsplit", "hsplit",
    "dsplit", "atleast_3d", "diagonal", "diagflat", "digitize", "angle",
    "fix", "divmod", "compress", "extract", "broadcast_arrays",
    "broadcast_shapes", "asanyarray", "astype", "acos", "acosh", "asin",
    "asinh", "atan", "atanh", "atan2", "bitwise_invert",
    "bitwise_left_shift", "bitwise_right_shift", "concat", "pow",
    "permute_dims",
]


def _to_ba(obj):
    app = _instance()
    if isinstance(obj, BlockArray):
        return obj
    if isinstance(obj, (bool, int, float, complex, np.generic)):
        return app.scalar(obj)
    return app.array(np.asarray(obj), block_shape=None)


@functools.lru_cache(maxsize=None)
def _jit_kw(fname, **kw):
    """jnp.<fname> with keyword statics baked in (stable kernel object)."""
    fn = getattr(jnp, fname)
    return jax.jit(lambda x: fn(x, **kw))


@functools.lru_cache(maxsize=None)
def _jit2_kw(fname, **kw):
    """Two-array variant of _jit_kw."""
    fn = getattr(jnp, fname)
    return jax.jit(lambda x, y: fn(x, y, **kw))


def _call(kernel, *operands):
    """Run a cached kernel over BlockArray/traceable operands via the
    pad-and-mask + lazy adapter. Returns (data, logical_shape(s))."""
    args, lshapes, ts = [], [], []
    backend = None
    for o in operands:
        if isinstance(o, BlockArray):
            if backend is None:
                backend = o.backend
            args.append(o._data)
            lshapes.append(o._raw_logical_shape())
            ts.append(o.is_transposed)
        else:
            args.append(o)
            lshapes.append(None)
            ts.append(False)
    assert backend is not None, "at least one BlockArray operand required"
    return padded.call(
        kernel, tuple(args), tuple(lshapes), backend, transposes=tuple(ts)
    )


def _wrap(a, data, block_shape=None, shape=None):
    shape = tuple(shape) if shape is not None else tuple(data.shape)
    if block_shape is None:
        block_shape = array_utils.default_block_shape_for(
            shape, a.block_shape
        )
    block_shape = tuple(
        min(b, s) for b, s in zip(tuple(block_shape), shape)
    )
    grid = ArrayGrid(shape, block_shape, np.dtype(data.dtype).name)
    return BlockArray(data, grid, a.backend)


def _wrapc(a, callres, block_shape=None):
    data, lshape = callres
    return _wrap(a, data, block_shape, shape=lshape)


def _unary_kw(fname):
    def fn(a, axis=None, **kwargs):
        a = _to_ba(a)
        return _wrapc(a, _call(_jit_kw(fname, axis=axis, **kwargs), a))

    fn.__name__ = fname
    fn.__doc__ = f"{fname} as one jitted XLA kernel."
    return fn


# -- reductions / scans -------------------------------------------------

prod = _unary_kw("prod")
all = _unary_kw("all")  # noqa: A001 - numpy-compatible name
any = _unary_kw("any")  # noqa: A001
cumsum = _unary_kw("cumsum")
cumprod = _unary_kw("cumprod")
nansum = _unary_kw("nansum")
nanmean = _unary_kw("nanmean")
nanmax = _unary_kw("nanmax")
nanmin = _unary_kw("nanmin")
nanvar = _unary_kw("nanvar")
nanstd = _unary_kw("nanstd")
median = _unary_kw("median")
nanmedian = _unary_kw("nanmedian")
ptp = _unary_kw("ptp")
count_nonzero = _unary_kw("count_nonzero")


@functools.lru_cache(maxsize=None)
def _k_average(axis):
    return jax.jit(lambda x, w: jnp.average(x, axis=axis, weights=w))


def average(a, axis=None, weights=None):
    a = _to_ba(a)
    if weights is None:
        return _instance().mean(a, axis=axis)
    w = _to_ba(weights)
    return _wrapc(a, _call(_k_average(axis), a, w))


# -- rounding / clipping ------------------------------------------------


@functools.lru_cache(maxsize=None)
def _k_clip(has_min, has_max):
    if has_min and has_max:
        return jax.jit(lambda x, lo, hi: jnp.clip(x, lo, hi))
    if has_min:
        return jax.jit(lambda x, lo: jnp.clip(x, lo, None))
    return jax.jit(lambda x, hi: jnp.clip(x, None, hi))


def clip(a, a_min=None, a_max=None):
    a = _to_ba(a)
    bounds = [b for b in (a_min, a_max) if b is not None]
    kernel = _k_clip(a_min is not None, a_max is not None)
    return _wrapc(a, _call(kernel, a, *bounds), a.block_shape)


def around(a, decimals=0):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("round", decimals=decimals), a),
                  a.block_shape)


round = around  # noqa: A001 - numpy alias
round_ = around


# -- sorting / searching ------------------------------------------------

def sort(a, axis=-1, **kwargs):
    """np.sort parity: default axis is -1 (NOT None — None flattens)."""
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("sort", axis=axis, **kwargs), a))


def argsort(a, axis=-1, **kwargs):
    """np.argsort parity: default axis is -1."""
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("argsort", axis=axis, **kwargs), a))


@functools.lru_cache(maxsize=None)
def _k_searchsorted(side):
    return jax.jit(lambda x, q: jnp.searchsorted(x, q, side=side))


def searchsorted(a, v, side="left"):
    a, v = _to_ba(a), _to_ba(v)
    return _wrapc(a, _call(_k_searchsorted(side), a, v))


@functools.lru_cache(maxsize=None)
def _k_take(axis):
    return jax.jit(lambda x, idx: jnp.take(x, idx, axis=axis))


def take(a, indices, axis=None):
    a = _to_ba(a)
    indices = _to_ba(indices)
    return _wrapc(a, _call(_k_take(axis), a, indices))


# -- shape manipulation -------------------------------------------------


@functools.lru_cache(maxsize=None)
def _k_concat_like(fname, n, **kw):
    del n  # arity is part of the cache key; jit retraces per avals anyway
    fn = getattr(jnp, fname)
    return jax.jit(lambda *ds: fn(ds, **kw))


def _concat_like(fname, arrays, **kw):
    bas = [_to_ba(a) for a in arrays]
    kernel = _k_concat_like(fname, len(bas), **kw)
    return _wrapc(bas[0], _call(kernel, *bas))


def stack(arrays, axis=0):
    return _concat_like("stack", arrays, axis=axis)


def vstack(tup):
    return _concat_like("vstack", tup)


def hstack(tup):
    return _concat_like("hstack", tup)


def dstack(tup):
    return _concat_like("dstack", tup)


def column_stack(tup):
    return _concat_like("column_stack", tup)


def row_stack(tup):
    return _concat_like("vstack", tup)


@functools.lru_cache(maxsize=None)
def _k_tile(reps):
    return jax.jit(lambda x: jnp.tile(x, reps))


def tile(a, reps):
    a = _to_ba(a)
    reps = tuple(reps) if isinstance(reps, (tuple, list)) else (int(reps),)
    return _wrapc(a, _call(_k_tile(reps), a))


@functools.lru_cache(maxsize=None)
def _k_repeat(repeats, axis):
    return jax.jit(lambda x: jnp.repeat(x, repeats, axis=axis))


def repeat(a, repeats, axis=None):
    a = _to_ba(a)
    return _wrapc(a, _call(_k_repeat(int(repeats), axis), a))


@functools.lru_cache(maxsize=None)
def _k_roll(shift, axis):
    return jax.jit(lambda x: jnp.roll(x, shift, axis=axis))


def roll(a, shift, axis=None):
    a = _to_ba(a)
    shift = shift if isinstance(shift, int) else tuple(shift)
    axis = axis if axis is None or isinstance(axis, int) else tuple(axis)
    return _wrapc(a, _call(_k_roll(shift, axis), a), a.block_shape)


def flip(a, axis=None):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("flip", axis=axis), a), a.block_shape)


def fliplr(a):
    return flip(a, axis=1)


def flipud(a):
    return flip(a, axis=0)


def ravel(a):
    a = _to_ba(a)
    return a.reshape(a.size)


def swapaxes(a, axis1, axis2):
    a = _to_ba(a)
    perm = list(range(a.ndim))
    perm[axis1], perm[axis2] = perm[axis2], perm[axis1]
    return a.transpose(*perm)


@functools.lru_cache(maxsize=None)
def _k_moveaxis(source, destination):
    return jax.jit(lambda x: jnp.moveaxis(x, source, destination))


def moveaxis(a, source, destination):
    a = _to_ba(a)
    return _wrapc(a, _call(_k_moveaxis(source, destination), a))


def atleast_1d(a):
    a = _to_ba(a)
    return a if a.ndim >= 1 else a.reshape(1)


def atleast_2d(a):
    a = _to_ba(a)
    if a.ndim >= 2:
        return a
    if a.ndim == 1:
        return a.reshape(1, a.shape[0])
    return a.reshape(1, 1)


def broadcast_to(a, shape):
    a = _to_ba(a)
    return a.broadcast_to(tuple(shape))


def triu(a, k=0):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("triu", k=k), a), a.block_shape)


def tril(a, k=0):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("tril", k=k), a), a.block_shape)


# -- contractions -------------------------------------------------------


def dot(a, b):
    a, b = _to_ba(a), _to_ba(b)
    if a.ndim == 0 or b.ndim == 0:
        return a * b
    if a.ndim <= 2 and b.ndim <= 2:
        return a @ b
    # np.dot general case: contract last axis of a with 2nd-to-last of b.
    return a.tensordot(b, axes=((a.ndim - 1,), (max(0, b.ndim - 2),)))


def inner(a, b):
    a, b = _to_ba(a), _to_ba(b)
    if a.ndim == 0 or b.ndim == 0:
        return a * b
    return a.tensordot(b, axes=((a.ndim - 1,), (b.ndim - 1,)))


def outer(a, b):
    a, b = _to_ba(a), _to_ba(b)
    return ravel(a).tensordot(ravel(b), axes=0)


def trace(a, offset=0):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("trace", offset=offset), a))


def vdot(a, b):
    a, b = _to_ba(a), _to_ba(b)
    return ravel(a).tensordot(ravel(b), axes=1)


@functools.lru_cache(maxsize=None)
def _k_einsum(subscripts, n):
    del n
    return jax.jit(lambda *ds: jnp.einsum(subscripts, *ds))


def einsum(subscripts, *operands):
    bas = [_to_ba(o) for o in operands]
    return _wrapc(bas[0], _call(_k_einsum(subscripts, len(bas)), *bas))


_k_kron = jax.jit(lambda x, y: jnp.kron(x, y))


def kron(a, b):
    a, b = _to_ba(a), _to_ba(b)
    return _wrapc(a, _call(_k_kron, a, b))


def matrix_transpose(a):
    return _to_ba(a).transpose()


# -- predicates ---------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _k_isclose(rtol, atol, equal_nan):
    return jax.jit(
        lambda x, y: jnp.isclose(
            x, y, rtol=rtol, atol=atol, equal_nan=equal_nan
        )
    )


def isclose(a, b, rtol=1e-5, atol=1e-8, equal_nan=False):
    a, b = _to_ba(a), _to_ba(b)
    return _wrapc(a, _call(_k_isclose(rtol, atol, equal_nan), a, b))


_k_array_equal = jax.jit(lambda x, y: jnp.array_equal(x, y))


def array_equal(a, b):
    a, b = _to_ba(a), _to_ba(b)
    if a.shape != b.shape:
        return _instance().scalar(False)
    return _wrapc(a, _call(_k_array_equal, a, b))


def real(a):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("real"), a), a.block_shape)


def imag(a):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("imag"), a), a.block_shape)


def nan_to_num(a, nan=0.0, posinf=None, neginf=None):
    a = _to_ba(a)
    kernel = _jit_kw("nan_to_num", nan=nan, posinf=posinf, neginf=neginf)
    return _wrapc(a, _call(kernel, a), a.block_shape)


def diff(a, n=1, axis=-1):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("diff", n=n, axis=axis), a))


def unique(a, return_index=False, return_inverse=False,
           return_counts=False, axis=None, *, equal_nan=True):
    """Device-resolved np.unique (capacity idiom, like ``where``): ONE
    scalar host sync for the distinct count; values/index/counts are
    built on device and never round-trip the host.

    ``axis`` keyword: row/column uniqueness is a host fallback (rare,
    structurally different algorithm)."""
    a = _to_ba(a)
    app = _instance()
    if axis is not None:
        outs = np.unique(
            a.get(), return_index=return_index,
            return_inverse=return_inverse, return_counts=return_counts,
            axis=axis, equal_nan=equal_nan,
        )
        if not isinstance(outs, tuple):
            return app.array(outs, block_shape=None)
        return tuple(app.array(o, block_shape=None) for o in outs)
    if a.size == 0:
        outs = np.unique(
            a.get(), return_index=return_index,
            return_inverse=return_inverse, return_counts=return_counts,
        )
        if not isinstance(outs, tuple):
            return app.array(outs, block_shape=outs.shape)
        return tuple(app.array(o, block_shape=o.shape) for o in outs)
    from nums_tpu.core.ops import masking

    _, outs = masking.device_unique(
        a, want_index=return_index, want_inverse=return_inverse,
        want_counts=return_counts, equal_nan=equal_nan,
    )
    wrapped = tuple(
        BlockArray.from_jax(o, block_shape=tuple(o.shape),
                            backend=a.backend)
        for o in outs
    )
    return wrapped if len(wrapped) > 1 else wrapped[0]


# -- statistics ----------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _k_quantile_like(fname, qt, axis, squeeze0):
    fn = getattr(jnp, fname)

    def impl(x):
        out = fn(x, jnp.asarray(qt), axis=axis)
        return out[0] if squeeze0 else out

    return jax.jit(impl)


def percentile(a, q, axis=None):
    a = _to_ba(a)
    qt = tuple(np.atleast_1d(q).tolist())
    kernel = _k_quantile_like("percentile", qt, axis, np.isscalar(q))
    return _wrapc(a, _call(kernel, a))


def quantile(a, q, axis=None):
    a = _to_ba(a)
    qt = tuple(np.atleast_1d(q).tolist())
    kernel = _k_quantile_like("quantile", qt, axis, np.isscalar(q))
    return _wrapc(a, _call(kernel, a))


@functools.lru_cache(maxsize=None)
def _k_histogram(bins, range):  # noqa: A002
    def impl(x):
        return tuple(jnp.histogram(x, bins=bins, range=range))

    return jax.jit(impl)


_k_histogram_arr = jax.jit(lambda x, b: tuple(jnp.histogram(x, bins=b)))


def histogram(a, bins=10, range=None):  # noqa: A002
    a = _to_ba(a)
    if not isinstance(bins, int):
        bins_arr = jnp.asarray(np.asarray(bins))
        (h, e), (h_l, e_l) = _call(_k_histogram_arr, a, bins_arr)
    else:
        (h, e), (h_l, e_l) = _call(_k_histogram(bins, range), a)
    return _wrap(a, h, shape=h_l), _wrap(a, e, shape=e_l)


@functools.lru_cache(maxsize=None)
def _k_cov(rowvar, ddof):
    return jax.jit(lambda x: jnp.cov(x, rowvar=rowvar, ddof=ddof))


def cov(m, rowvar=True, ddof=None):
    m = _to_ba(m)
    return _wrapc(m, _call(_k_cov(rowvar, ddof), m))


@functools.lru_cache(maxsize=None)
def _k_corrcoef(rowvar):
    return jax.jit(lambda x: jnp.corrcoef(x, rowvar=rowvar))


def corrcoef(m, rowvar=True):
    m = _to_ba(m)
    return _wrapc(m, _call(_k_corrcoef(rowvar), m))


_k_interp = jax.jit(lambda a, b, c: jnp.interp(a, b, c))


def interp(x, xp, fp):
    x, xp, fp = _to_ba(x), _to_ba(xp), _to_ba(fp)
    return _wrapc(x, _call(_k_interp, x, xp, fp))


@functools.lru_cache(maxsize=None)
def _k_pad(pw, mode, constant_values):
    kw = {"constant_values": constant_values} if mode == "constant" else {}
    return jax.jit(lambda x: jnp.pad(x, pw, mode=mode, **kw))


def pad(array, pad_width, mode="constant", constant_values=0):
    a = _to_ba(array)
    if isinstance(pad_width, int):
        pw = ((pad_width, pad_width),) * a.ndim
    else:
        pw = tuple(
            (w, w) if isinstance(w, int) else tuple(w) for w in pad_width
        )
        if len(pw) == 1:
            pw = pw * a.ndim
    return _wrapc(a, _call(_k_pad(pw, mode, constant_values), a))


@functools.lru_cache(maxsize=None)
def _k_bincount(length):
    return jax.jit(lambda v: jnp.bincount(v, length=length))


def bincount(x, minlength=0):
    """Output length is max(x)+1 — data-dependent ⇒ one host sync to size
    the result; the counting itself runs on device."""
    x = _to_ba(x)
    length = builtins.max(
        int(minlength), int(x.max()) + 1 if x.size else 0
    )
    return _wrapc(x, _call(_k_bincount(length), x))


# -- remaining manipulation / misc ---------------------------------------


def full_like(a, fill_value, dtype=None, shape=None):
    a = _to_ba(a)
    app = _instance()
    shape = tuple(shape) if shape is not None else a.shape
    dtype = dtype if dtype is not None else a.dtype
    block_shape = app.get_block_shape(shape, dtype)
    return app.full(shape, block_shape, fill_value, dtype)


def geomspace(start, stop, num=50, endpoint=True, dtype=None):
    from nums_tpu.numpy import api as _api

    return _api.logspace(
        float(np.log10(start)), float(np.log10(stop)), num=num,
        endpoint=endpoint, dtype=dtype,
    )


@functools.lru_cache(maxsize=None)
def _k_append(axis):
    return jax.jit(lambda x, v: jnp.append(x, v, axis=axis))


def append(arr, values, axis=None):
    arr, values = _to_ba(arr), _to_ba(values)
    return _wrapc(arr, _call(_k_append(axis), arr, values))


def array_split(ary, indices_or_sections, axis=0):
    ary = _to_ba(ary)
    if isinstance(indices_or_sections, int):
        bounds = np.array_split(np.arange(ary.shape[axis]),
                                indices_or_sections)
        cuts = [(int(b[0]), int(b[-1]) + 1) for b in bounds if len(b)]
    else:
        idx = [0] + list(indices_or_sections) + [ary.shape[axis]]
        cuts = [(idx[i], idx[i + 1]) for i in range(len(idx) - 1)]
    out = []
    for lo, hi in cuts:
        sel = tuple(
            slice(lo, hi) if ax == axis else slice(None)
            for ax in range(ary.ndim)
        )
        out.append(ary[sel])
    return out


def vsplit(ary, n):
    return array_split(ary, n, axis=0)


def hsplit(ary, n):
    return array_split(ary, n, axis=1)


def dsplit(ary, n):
    return array_split(ary, n, axis=2)


def atleast_3d(a):
    a = _to_ba(a)
    if a.ndim >= 3:
        return a
    if a.ndim == 2:
        return a.reshape(a.shape[0], a.shape[1], 1)
    if a.ndim == 1:
        return a.reshape(1, a.shape[0], 1)
    return a.reshape(1, 1, 1)


def diagonal(a, offset=0):
    a = _to_ba(a)
    return _wrapc(a, _call(_jit_kw("diagonal", offset=offset), a))


def diagflat(v, k=0):
    v = _to_ba(v)
    return _wrapc(v, _call(_jit_kw("diagflat", k=k), v))


@functools.lru_cache(maxsize=None)
def _k_digitize(right):
    return jax.jit(lambda xx, bb: jnp.digitize(xx, bb, right=right))


def digitize(x, bins, right=False):
    x, bins = _to_ba(x), _to_ba(bins)
    return _wrapc(x, _call(_k_digitize(right), x, bins))


def angle(z, deg=False):
    z = _to_ba(z)
    return _wrapc(z, _call(_jit_kw("angle", deg=deg), z), z.block_shape)


def fix(x):
    # jnp.fix is deprecated (jax 0.9); trunc is the replacement.
    x = _to_ba(x)
    return _wrapc(x, _call(_jit_kw("trunc"), x), x.block_shape)


_k_divmod = jax.jit(lambda a, b: jnp.divmod(a, b))


def divmod(x1, x2):  # noqa: A001
    x1 = _to_ba(x1)
    x2 = _to_ba(x2)
    (q, r), (q_l, r_l) = _call(_k_divmod, x1, x2)
    return _wrap(x1, q, shape=q_l), _wrap(x1, r, shape=r_l)


def _mask_indices_1d(condition):
    """1-D True-position indices for a condition of either residence.

    Device-held masks resolve via the capacity idiom (ONE scalar sync,
    O(result) device-side indices — the mask never crosses the host
    boundary); host masks use np.where locally (already host data, the
    index upload is O(result))."""
    if isinstance(condition, BlockArray):
        from nums_tpu.core.ops import masking

        flat = condition if condition.ndim == 1 else ravel(condition)
        _, idx = masking.device_where(flat != 0)
        return idx[0]
    return jnp.asarray(np.where(np.ravel(np.asarray(condition)))[0])


def compress(condition, a, axis=None):
    """np.compress with device-resolved mask indices (one scalar sync)."""
    a = _to_ba(a)
    idx = _mask_indices_1d(condition)
    if axis is None:
        return ravel(a)[idx]
    sel = tuple(
        idx if ax == axis else slice(None) for ax in range(a.ndim)
    )
    return a[sel]


def extract(condition, arr):
    """np.extract with device-resolved mask indices (one scalar sync)."""
    arr = _to_ba(arr)
    return ravel(arr)[_mask_indices_1d(condition)]


def broadcast_arrays(*args):
    bas = [_to_ba(a) for a in args]
    target = np.broadcast_shapes(*[b.shape for b in bas])
    return [b.broadcast_to(target) for b in bas]


broadcast_shapes = np.broadcast_shapes


def asanyarray(a, dtype=None):
    from nums_tpu.numpy import api as _api

    return _api.asarray(a, dtype=dtype)


def astype(x, dtype):
    return _to_ba(x).astype(dtype)


# NumPy 2 operator aliases.
def _alias_of(target_name, module=None):
    def alias(*args, **kwargs):
        from nums_tpu.numpy import api as _api

        mod = module if module is not None else _api
        return getattr(mod, target_name)(*args, **kwargs)

    alias.__name__ = target_name
    return alias


acos = _alias_of("arccos")
acosh = _alias_of("arccosh")
asin = _alias_of("arcsin")
asinh = _alias_of("arcsinh")
atan = _alias_of("arctan")
atanh = _alias_of("arctanh")
atan2 = _alias_of("arctan2")
bitwise_invert = _alias_of("invert")
bitwise_left_shift = _alias_of("left_shift")
bitwise_right_shift = _alias_of("right_shift")
concat = _alias_of("concatenate")
pow = _alias_of("power")  # noqa: A001
permute_dims = _alias_of("transpose")


# -- signal / misc -------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _k_meshgrid(indexing, n):
    del n
    return jax.jit(lambda *ds: tuple(jnp.meshgrid(*ds, indexing=indexing)))


def meshgrid(*xi, indexing="xy"):
    bas = [_to_ba(x) for x in xi]
    outs, lshapes = _call(_k_meshgrid(indexing, len(bas)), *bas)
    return [_wrap(bas[0], o, shape=ls) for o, ls in zip(outs, lshapes)]


@functools.lru_cache(maxsize=None)
def _k_cross(axis):
    return jax.jit(lambda x, y: jnp.cross(x, y, axis=axis))


def cross(a, b, axis=-1):
    a, b = _to_ba(a), _to_ba(b)
    return _wrapc(a, _call(_k_cross(axis), a, b))


@functools.lru_cache(maxsize=None)
def _k_convolve_like(fname, mode):
    fn = getattr(jnp, fname)
    return jax.jit(lambda x, y: fn(x, y, mode=mode))


def convolve(a, v, mode="full"):
    a, v = _to_ba(a), _to_ba(v)
    return _wrapc(a, _call(_k_convolve_like("convolve", mode), a, v))


def correlate(a, v, mode="valid"):
    a, v = _to_ba(a), _to_ba(v)
    return _wrapc(a, _call(_k_convolve_like("correlate", mode), a, v))


@functools.lru_cache(maxsize=None)
def _k_gradient(axis):
    def impl(x):
        out = jnp.gradient(x, axis=axis)
        return tuple(out) if isinstance(out, (tuple, list)) else out

    return jax.jit(impl)


def gradient(f, axis=None):
    f = _to_ba(f)
    data, lshape = _call(_k_gradient(axis), f)
    if isinstance(data, tuple):
        return [_wrap(f, d, shape=ls) for d, ls in zip(data, lshape)]
    return _wrap(f, data, shape=lshape)


@functools.lru_cache(maxsize=None)
def _k_trapezoid(dx, axis):
    return jax.jit(lambda yy: jnp.trapezoid(yy, dx=dx, axis=axis))


@functools.lru_cache(maxsize=None)
def _k_trapezoid_x(axis):
    return jax.jit(lambda yy, xx: jnp.trapezoid(yy, xx, axis=axis))


def trapezoid(y, x=None, dx=1.0, axis=-1):
    y = _to_ba(y)
    if x is None:
        return _wrapc(y, _call(_k_trapezoid(float(dx), axis), y))
    x = _to_ba(x)
    return _wrapc(y, _call(_k_trapezoid_x(axis), y, x))


trapz = trapezoid


def sinc(x):
    x = _to_ba(x)
    return _wrapc(x, _call(_jit_kw("sinc"), x), x.block_shape)


def ediff1d(ary):
    ary = _to_ba(ary)
    return _wrapc(ary, _call(_jit_kw("ediff1d"), ary))


@functools.lru_cache(maxsize=None)
def _k_vander(N, increasing):
    return jax.jit(lambda v: jnp.vander(v, N=N, increasing=increasing))


def vander(x, N=None, increasing=False):
    x = _to_ba(x)
    return _wrapc(x, _call(_k_vander(N, increasing), x))


@functools.lru_cache(maxsize=None)
def _k_tri(N, M, k, dtype_name):
    return jax.jit(lambda: jnp.tri(N, M, k, dtype=np.dtype(dtype_name)))


def tri(N, M=None, k=0, dtype=float):
    """Built ON DEVICE (jnp.tri iota comparison) — no host constant."""
    data = _k_tri(int(N), None if M is None else int(M), int(k),
                  np.dtype(dtype).name)()
    return BlockArray.from_jax(data, backend=_instance().backend)


def argwhere(a):
    """Device-resolved (one scalar sync); indices stay on device."""
    from nums_tpu.core.ops import masking

    a = _to_ba(a)
    if a.ndim == 0:
        out = np.argwhere(a.get())
        return _instance().array(out, block_shape=out.shape)
    count, idx = masking.device_where(a != 0)
    data = jnp.stack(idx, axis=-1).astype(jnp.int64)
    return BlockArray.from_jax(data, block_shape=tuple(data.shape),
                               backend=a.backend)


def flatnonzero(a):
    from nums_tpu.core.ops import masking

    a = _to_ba(a)
    if a.ndim == 0:
        out = np.flatnonzero(a.get())
        return _instance().array(out, block_shape=out.shape)
    flat = ravel(a)
    _, idx = masking.device_where(flat != 0)
    return BlockArray.from_jax(idx[0].astype(jnp.int64),
                               backend=a.backend)


def nonzero(a):
    from nums_tpu.core.application_manager import instance

    return instance().where(_to_ba(a))
