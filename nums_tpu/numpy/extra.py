"""Extended NumPy surface beyond the reference's ~120 functions.

Every function here is a real jitted-XLA implementation over BlockArray
(not a host fallback): manipulation (stack/tile/roll/flip/sort...),
scan ops (cumsum/cumprod), predicates (all/any/isclose), nan-reductions,
and contraction helpers (dot/inner/outer/trace). Loaded into
``nums_tpu.numpy`` by its __init__.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from nums_tpu.core.application_manager import instance as _instance
from nums_tpu.core.array.blockarray import BlockArray
from nums_tpu.core.array import utils as array_utils


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
    fn = getattr(jnp, fname)
    return jax.jit(lambda x: fn(x, **kw))


def _wrap(a, data, block_shape=None):
    if block_shape is None:
        block_shape = array_utils.default_block_shape_for(
            tuple(data.shape), a.block_shape
        )
    return BlockArray.from_jax(data, block_shape=block_shape,
                               backend=a.backend)


def _unary_kw(fname):
    def fn(a, axis=None, **kwargs):
        a = _to_ba(a)
        data = _jit_kw(fname, axis=axis, **kwargs)(a.data)
        return _wrap(a, data)

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


def average(a, axis=None, weights=None):
    a = _to_ba(a)
    if weights is None:
        return _instance().mean(a, axis=axis)
    w = _to_ba(weights)

    @jax.jit
    def impl(x, ww):
        return jnp.average(x, axis=axis, weights=ww)

    return _wrap(a, impl(a.data, w.data))


# -- rounding / clipping ------------------------------------------------


def clip(a, a_min=None, a_max=None):
    a = _to_ba(a)

    @functools.partial(jax.jit, static_argnames=("lo", "hi"))
    def impl(x, lo, hi):
        return jnp.clip(x, lo, hi)

    return _wrap(a, impl(a.data, a_min, a_max), a.block_shape)


def around(a, decimals=0):
    a = _to_ba(a)
    data = _jit_kw("round", decimals=decimals)(a.data)
    return _wrap(a, data, a.block_shape)


round = around  # noqa: A001 - numpy alias
round_ = around


# -- sorting / searching ------------------------------------------------

def sort(a, axis=-1, **kwargs):
    """np.sort parity: default axis is -1 (NOT None — None flattens)."""
    a = _to_ba(a)
    return _wrap(a, _jit_kw("sort", axis=axis, **kwargs)(a.data))


def argsort(a, axis=-1, **kwargs):
    """np.argsort parity: default axis is -1."""
    a = _to_ba(a)
    return _wrap(a, _jit_kw("argsort", axis=axis, **kwargs)(a.data))


def searchsorted(a, v, side="left"):
    a, v = _to_ba(a), _to_ba(v)

    @functools.partial(jax.jit, static_argnames=("side",))
    def impl(x, q, side):
        return jnp.searchsorted(x, q, side=side)

    return _wrap(a, impl(a.data, v.data, side))


def take(a, indices, axis=None):
    a = _to_ba(a)
    indices = _to_ba(indices)

    @functools.partial(jax.jit, static_argnames=("axis",))
    def impl(x, idx, axis):
        return jnp.take(x, idx, axis=axis)

    return _wrap(a, impl(a.data, indices.data, axis))


# -- shape manipulation -------------------------------------------------


def _concat_like(fname, arrays, **kw):
    bas = [_to_ba(a) for a in arrays]
    datas = tuple(b.data for b in bas)
    fn = getattr(jnp, fname)

    @jax.jit
    def impl(*ds):
        return fn(ds, **kw)

    return _wrap(bas[0], impl(*datas))


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


def tile(a, reps):
    a = _to_ba(a)
    reps = tuple(reps) if isinstance(reps, (tuple, list)) else (reps,)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def impl(x, reps):
        return jnp.tile(x, reps)

    return _wrap(a, impl(a.data, reps))


def repeat(a, repeats, axis=None):
    a = _to_ba(a)

    @functools.partial(jax.jit, static_argnames=("repeats", "axis"))
    def impl(x, repeats, axis):
        return jnp.repeat(x, repeats, axis=axis)

    return _wrap(a, impl(a.data, int(repeats), axis))


def roll(a, shift, axis=None):
    a = _to_ba(a)

    @functools.partial(jax.jit, static_argnames=("shift", "axis"))
    def impl(x, shift, axis):
        return jnp.roll(x, shift, axis=axis)

    return _wrap(a, impl(a.data, shift if isinstance(shift, int) else tuple(shift), axis), a.block_shape)


def flip(a, axis=None):
    a = _to_ba(a)
    data = _jit_kw("flip", axis=axis)(a.data)
    return _wrap(a, data, a.block_shape)


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


def moveaxis(a, source, destination):
    a = _to_ba(a)

    @functools.partial(jax.jit, static_argnames=("source", "destination"))
    def impl(x, source, destination):
        return jnp.moveaxis(x, source, destination)

    return _wrap(a, impl(a.data, source, destination))


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
    shape = tuple(shape)

    @functools.partial(jax.jit, static_argnames=("shape",))
    def impl(x, shape):
        return jnp.broadcast_to(x, shape)

    return _wrap(a, impl(a.data, shape))


def triu(a, k=0):
    a = _to_ba(a)
    data = _jit_kw("triu", k=k)(a.data)
    return _wrap(a, data, a.block_shape)


def tril(a, k=0):
    a = _to_ba(a)
    data = _jit_kw("tril", k=k)(a.data)
    return _wrap(a, data, a.block_shape)


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
    data = _jit_kw("trace", offset=offset)(a.data)
    return _wrap(a, data)


def vdot(a, b):
    a, b = _to_ba(a), _to_ba(b)
    return ravel(a).tensordot(ravel(b), axes=1)


def einsum(subscripts, *operands):
    bas = [_to_ba(o) for o in operands]
    datas = tuple(b.data for b in bas)

    @functools.partial(jax.jit, static_argnames=("subscripts",))
    def impl(subscripts, *ds):
        return jnp.einsum(subscripts, *ds)

    return _wrap(bas[0], impl(subscripts, *datas))


def kron(a, b):
    a, b = _to_ba(a), _to_ba(b)

    @jax.jit
    def impl(x, y):
        return jnp.kron(x, y)

    return _wrap(a, impl(a.data, b.data))


def matrix_transpose(a):
    return _to_ba(a).transpose()


# -- predicates ---------------------------------------------------------


def isclose(a, b, rtol=1e-5, atol=1e-8, equal_nan=False):
    a, b = _to_ba(a), _to_ba(b)

    @functools.partial(jax.jit, static_argnames=("rtol", "atol", "equal_nan"))
    def impl(x, y, rtol, atol, equal_nan):
        return jnp.isclose(x, y, rtol=rtol, atol=atol, equal_nan=equal_nan)

    return _wrap(a, impl(a.data, b.data, rtol, atol, equal_nan))


def array_equal(a, b):
    a, b = _to_ba(a), _to_ba(b)
    if a.shape != b.shape:
        return _instance().scalar(False)

    @jax.jit
    def impl(x, y):
        return jnp.array_equal(x, y)

    return _wrap(a, impl(a.data, b.data))


def real(a):
    a = _to_ba(a)
    return _wrap(a, _jit_kw("real")(a.data), a.block_shape)


def imag(a):
    a = _to_ba(a)
    return _wrap(a, _jit_kw("imag")(a.data), a.block_shape)


def nan_to_num(a, nan=0.0, posinf=None, neginf=None):
    a = _to_ba(a)
    data = _jit_kw("nan_to_num", nan=nan, posinf=posinf, neginf=neginf)(a.data)
    return _wrap(a, data, a.block_shape)


def diff(a, n=1, axis=-1):
    a = _to_ba(a)
    data = _jit_kw("diff", n=n, axis=axis)(a.data)
    return _wrap(a, data)


def unique(a):
    """Data-dependent output shape ⇒ one host sync (same tradeoff as
    ``where``)."""
    a = _to_ba(a)
    out = np.unique(a.get())
    app = _instance()
    return app.array(out, block_shape=out.shape)


# -- statistics ----------------------------------------------------------


def percentile(a, q, axis=None):
    a = _to_ba(a)
    qt = tuple(np.atleast_1d(q).tolist())

    @functools.partial(jax.jit, static_argnames=("qt", "axis"))
    def impl(x, qt, axis):
        return jnp.percentile(x, jnp.asarray(qt), axis=axis)

    out = impl(a.data, qt, axis)
    if np.isscalar(q):
        out = out[0]
    return _wrap(a, out)


def quantile(a, q, axis=None):
    a = _to_ba(a)
    qt = tuple(np.atleast_1d(q).tolist())

    @functools.partial(jax.jit, static_argnames=("qt", "axis"))
    def impl(x, qt, axis):
        return jnp.quantile(x, jnp.asarray(qt), axis=axis)

    out = impl(a.data, qt, axis)
    if np.isscalar(q):
        out = out[0]
    return _wrap(a, out)


def histogram(a, bins=10, range=None):  # noqa: A002
    a = _to_ba(a)
    if not isinstance(bins, int):
        bins_arr = jnp.asarray(np.asarray(bins))

        @jax.jit
        def impl_arr(x, b):
            return jnp.histogram(x, bins=b)

        h, e = impl_arr(a.data, bins_arr)
    else:

        @functools.partial(jax.jit, static_argnames=("bins", "range"))
        def impl(x, bins, range):
            return jnp.histogram(x, bins=bins, range=range)

        h, e = impl(a.data, bins, range)
    return _wrap(a, h), _wrap(a, e)


def cov(m, rowvar=True, ddof=None):
    m = _to_ba(m)

    @functools.partial(jax.jit, static_argnames=("rowvar", "ddof"))
    def impl(x, rowvar, ddof):
        return jnp.cov(x, rowvar=rowvar, ddof=ddof)

    return _wrap(m, impl(m.data, rowvar, ddof))


def corrcoef(m, rowvar=True):
    m = _to_ba(m)

    @functools.partial(jax.jit, static_argnames=("rowvar",))
    def impl(x, rowvar):
        return jnp.corrcoef(x, rowvar=rowvar)

    return _wrap(m, impl(m.data, rowvar))


def interp(x, xp, fp):
    x, xp, fp = _to_ba(x), _to_ba(xp), _to_ba(fp)

    @jax.jit
    def impl(a, b, c):
        return jnp.interp(a, b, c)

    return _wrap(x, impl(x.data, xp.data, fp.data))


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

    @functools.partial(
        jax.jit, static_argnames=("pw", "mode", "constant_values")
    )
    def impl(x, pw, mode, constant_values):
        kw = {"constant_values": constant_values} if mode == "constant" else {}
        return jnp.pad(x, pw, mode=mode, **kw)

    return _wrap(a, impl(a.data, pw, mode, constant_values))


def bincount(x, minlength=0):
    """Output length is max(x)+1 — data-dependent ⇒ one host sync to size
    the result; the counting itself runs on device."""
    x = _to_ba(x)
    length = max(int(minlength), int(x.max()) + 1 if x.size else 0)

    @functools.partial(jax.jit, static_argnames=("length",))
    def impl(v, length):
        return jnp.bincount(v, length=length)

    return _wrap(x, impl(x.data, length))


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


def append(arr, values, axis=None):
    arr, values = _to_ba(arr), _to_ba(values)

    @functools.partial(jax.jit, static_argnames=("axis",))
    def impl(x, v, axis):
        return jnp.append(x, v, axis=axis)

    return _wrap(arr, impl(arr.data, values.data, axis))


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
    data = _jit_kw("diagonal", offset=offset)(a.data)
    return _wrap(a, data)


def diagflat(v, k=0):
    v = _to_ba(v)
    data = _jit_kw("diagflat", k=k)(v.data)
    return _wrap(v, data)


def digitize(x, bins, right=False):
    x, bins = _to_ba(x), _to_ba(bins)

    @functools.partial(jax.jit, static_argnames=("right",))
    def impl(xx, bb, right):
        return jnp.digitize(xx, bb, right=right)

    return _wrap(x, impl(x.data, bins.data, right))


def angle(z, deg=False):
    z = _to_ba(z)
    data = _jit_kw("angle", deg=deg)(z.data)
    return _wrap(z, data, z.block_shape)


def fix(x):
    # jnp.fix is deprecated (jax 0.9); trunc is the replacement.
    x = _to_ba(x)
    return _wrap(x, _jit_kw("trunc")(x.data), x.block_shape)


def divmod(x1, x2):  # noqa: A001
    x1 = _to_ba(x1)
    x2v = _to_ba(x2)
    x2d = x2v.data if isinstance(x2v, type(x1)) else x2v

    @jax.jit
    def impl(a, b):
        return jnp.divmod(a, b)

    q, r = impl(x1.data, x2d)
    return _wrap(x1, q), _wrap(x1, r)


def compress(condition, a, axis=None):
    """Data-dependent output shape ⇒ host sync for the mask indices."""
    a = _to_ba(a)
    cond = np.asarray(
        condition.get() if hasattr(condition, "get") else condition
    ).astype(bool)
    idx = np.where(cond)[0]
    if axis is None:
        return ravel(a)[idx]
    sel = tuple(
        idx if ax == axis else slice(None) for ax in range(a.ndim)
    )
    return a[sel]


def extract(condition, arr):
    arr = _to_ba(arr)
    cond = _to_ba(condition)
    return ravel(arr)[np.where(np.ravel(cond.get()))[0]]


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


def meshgrid(*xi, indexing="xy"):
    bas = [_to_ba(x) for x in xi]
    datas = tuple(b.data for b in bas)

    @functools.partial(jax.jit, static_argnames=("indexing",))
    def impl(indexing, *ds):
        return jnp.meshgrid(*ds, indexing=indexing)

    outs = impl(indexing, *datas)
    return [_wrap(bas[0], o) for o in outs]


def cross(a, b, axis=-1):
    a, b = _to_ba(a), _to_ba(b)

    @functools.partial(jax.jit, static_argnames=("axis",))
    def impl(x, y, axis):
        return jnp.cross(x, y, axis=axis)

    return _wrap(a, impl(a.data, b.data, axis))


def convolve(a, v, mode="full"):
    a, v = _to_ba(a), _to_ba(v)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def impl(x, y, mode):
        return jnp.convolve(x, y, mode=mode)

    return _wrap(a, impl(a.data, v.data, mode))


def correlate(a, v, mode="valid"):
    a, v = _to_ba(a), _to_ba(v)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def impl(x, y, mode):
        return jnp.correlate(x, y, mode=mode)

    return _wrap(a, impl(a.data, v.data, mode))


def gradient(f, axis=None):
    f = _to_ba(f)
    data = _jit_kw("gradient", axis=axis)(f.data)
    if isinstance(data, (tuple, list)):
        return [_wrap(f, d) for d in data]
    return _wrap(f, data)


def trapezoid(y, x=None, dx=1.0, axis=-1):
    y = _to_ba(y)
    if x is None:

        @functools.partial(jax.jit, static_argnames=("dx", "axis"))
        def impl(yy, dx, axis):
            return jnp.trapezoid(yy, dx=dx, axis=axis)

        return _wrap(y, impl(y.data, dx, axis))
    x = _to_ba(x)

    @functools.partial(jax.jit, static_argnames=("axis",))
    def impl2(yy, xx, axis):
        return jnp.trapezoid(yy, xx, axis=axis)

    return _wrap(y, impl2(y.data, x.data, axis))


trapz = trapezoid


def sinc(x):
    x = _to_ba(x)
    return _wrap(x, _jit_kw("sinc")(x.data), x.block_shape)


def ediff1d(ary):
    ary = _to_ba(ary)
    return _wrap(ary, _jit_kw("ediff1d")(ary.data))


def vander(x, N=None, increasing=False):
    x = _to_ba(x)

    @functools.partial(jax.jit, static_argnames=("N", "increasing"))
    def impl(v, N, increasing):
        return jnp.vander(v, N=N, increasing=increasing)

    return _wrap(x, impl(x.data, N, increasing))


def tri(N, M=None, k=0, dtype=float):
    arr = np.tri(N, M, k, dtype=dtype)
    return _instance().array(arr, block_shape=None)


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
