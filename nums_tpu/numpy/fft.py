"""nums_tpu.numpy.fft — FFT surface on XLA kernels.

The reference ships only empty scaffolding (``nums/numpy/fft.py``); this
build implements the np.fft API over ``jnp.fft`` (single fused XLA FFT per
call, sharding-propagated under a mesh).
"""

import functools as _functools

import jax as _jax
import jax.numpy as _jnp

from nums_tpu.core.array.blockarray import BlockArray as _BA


@_functools.lru_cache(maxsize=None)
def _jit(fname, n, axis, norm):
    fn = getattr(_jnp.fft, fname)
    return _jax.jit(lambda x: fn(x, n=n, axis=axis, norm=norm))


def _make(fname):
    def fft_fn(a, n=None, axis=-1, norm=None):
        out = _jit(fname, n, axis, norm)(a.data)
        return _BA.from_jax(out, backend=a.backend)

    fft_fn.__name__ = fname
    fft_fn.__doc__ = f"{fname} via a single jitted XLA FFT kernel."
    return fft_fn


fft = _make("fft")
ifft = _make("ifft")
rfft = _make("rfft")
irfft = _make("irfft")
hfft = _make("hfft")
ihfft = _make("ihfft")


@_functools.lru_cache(maxsize=None)
def _jit_nd(fname, s, axes, norm):
    fn = getattr(_jnp.fft, fname)
    return _jax.jit(lambda x: fn(x, s=s, axes=axes, norm=norm))


def _make_nd(fname):
    def fft_fn(a, s=None, axes=None, norm=None):
        s = tuple(s) if s is not None else None
        axes_t = tuple(axes) if axes is not None else None
        out = _jit_nd(fname, s, axes_t, norm)(a.data)
        return _BA.from_jax(out, backend=a.backend)

    fft_fn.__name__ = fname
    fft_fn.__doc__ = f"{fname} via a single jitted XLA FFT kernel."
    return fft_fn


fftn = _make_nd("fftn")
ifftn = _make_nd("ifftn")
rfftn = _make_nd("rfftn")
irfftn = _make_nd("irfftn")


def _make_2d(fname):
    nd = _make_nd(fname.replace("2", "n"))

    def fft2_fn(a, s=None, axes=(-2, -1), norm=None):
        return nd(a, s=s, axes=axes, norm=norm)

    fft2_fn.__name__ = fname
    return fft2_fn


fft2 = _make_2d("fft2")
ifft2 = _make_2d("ifft2")
rfft2 = _make_2d("rfft2")
irfft2 = _make_2d("irfft2")


@_functools.lru_cache(maxsize=None)
def _jit_shift(fname):
    fn = getattr(_jnp.fft, fname)
    return _jax.jit(lambda x: fn(x))


def fftshift(a):
    return _BA.from_jax(_jit_shift("fftshift")(a.data), backend=a.backend)


def ifftshift(a):
    return _BA.from_jax(_jit_shift("ifftshift")(a.data), backend=a.backend)


def fftfreq(n, d=1.0):
    import numpy as _np
    from nums_tpu.core.application_manager import instance as _instance

    return _instance().array(_np.fft.fftfreq(n, d), block_shape=(n,))


def rfftfreq(n, d=1.0):
    import numpy as _np
    from nums_tpu.core.application_manager import instance as _instance

    out = _np.fft.rfftfreq(n, d)
    return _instance().array(out, block_shape=out.shape)
