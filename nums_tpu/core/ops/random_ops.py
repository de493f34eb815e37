"""Random sampling kernels on the counter-based TPU PRNG.

Replaces the reference's per-block PCG64 jump-ahead streams
(``block_rng``/``RNG``, numpy_compute.py:29-81): jax's threefry is
counter-based, so ONE whole-array sample is deterministic in (seed, shape)
and independent of sharding/block shape — the property the reference's
jump-ahead construction works to preserve (numpy_compute.py:56-68) holds
here by construction.

Distributions not in ``jax.random`` are derived by standard transforms;
a few awkward discrete ones fall back to host NumPy in the state object
(see nums_tpu/core/array/random.py).
"""

import functools

import jax
import jax.numpy as jnp
import jax.random as jr


def _u(key, shape, dtype):
    # Uniform in (0, 1): avoids log(0) in inversion transforms.
    return jr.uniform(
        key, shape, dtype, minval=jnp.finfo(dtype).tiny, maxval=1.0
    )


# Each impl: fn(key, shape, dtype, *params) -> array of `shape`/`dtype`.
_DISTS = {
    "random": lambda key, shape, dtype: jr.uniform(key, shape, dtype),
    "uniform": lambda key, shape, dtype, low, high: jr.uniform(
        key, shape, dtype, minval=low, maxval=high
    ),
    "normal": lambda key, shape, dtype, loc, scale: loc
    + scale * jr.normal(key, shape, dtype),
    "beta": lambda key, shape, dtype, a, b: jr.beta(key, a, b, shape, dtype),
    "binomial": lambda key, shape, dtype, n, p: jr.binomial(
        key, n, p, shape, dtype
    ),
    "chisquare": lambda key, shape, dtype, df: jr.chisquare(
        key, df, shape, dtype
    ),
    "exponential": lambda key, shape, dtype, scale: scale
    * jr.exponential(key, shape, dtype),
    "f": lambda key, shape, dtype, dfnum, dfden: jr.f(
        key, dfnum, dfden, shape, dtype
    ),
    "gamma": lambda key, shape, dtype, k, theta: theta
    * jr.gamma(key, k, shape, dtype),
    "geometric": lambda key, shape, dtype, p: jr.geometric(
        key, p, shape, jnp.int32
    ).astype(dtype),
    "gumbel": lambda key, shape, dtype, loc, scale: loc
    + scale * jr.gumbel(key, shape, dtype),
    "laplace": lambda key, shape, dtype, loc, scale: loc
    + scale * jr.laplace(key, shape, dtype),
    "logistic": lambda key, shape, dtype, loc, scale: loc
    + scale * jr.logistic(key, shape, dtype),
    "lognormal": lambda key, shape, dtype, mean, sigma: jnp.exp(
        mean + sigma * jr.normal(key, shape, dtype)
    ),
    # NumPy's pareto is the Lomax (Pareto-II minus 1).
    "pareto": lambda key, shape, dtype, a: jr.pareto(key, a, shape, dtype)
    - 1.0,
    "poisson": lambda key, shape, dtype, lam: jr.poisson(
        key, lam, shape
    ).astype(dtype),
    # power(a): density a·x^(a-1) on [0,1] == U^(1/a).
    "power": lambda key, shape, dtype, a: _u(key, shape, dtype) ** (1.0 / a),
    "rayleigh": lambda key, shape, dtype, scale: jr.rayleigh(
        key, scale, shape, dtype
    ),
    "standard_cauchy": lambda key, shape, dtype: jr.cauchy(
        key, shape, dtype
    ),
    "standard_t": lambda key, shape, dtype, df: jr.t(key, df, shape, dtype),
    "triangular": lambda key, shape, dtype, left, mode, right: jr.triangular(
        key, left, mode, right, shape, dtype
    ),
    "wald": lambda key, shape, dtype, mean, scale: jr.wald(
        key, mean, shape, dtype
    )
    * scale,
    # NumPy weibull(a): scale-1 Weibull == (-ln U)^(1/a).
    "weibull": lambda key, shape, dtype, a: (-jnp.log(_u(key, shape, dtype)))
    ** (1.0 / a),
    # negative_binomial(n, p) == Poisson(Gamma(n, (1-p)/p)).
    "negative_binomial": lambda key, shape, dtype, n, p: _negative_binomial(
        key, shape, dtype, n, p
    ),
    "noncentral_chisquare": lambda key, shape, dtype, df, nonc: (
        _noncentral_chisquare(key, shape, dtype, df, nonc)
    ),
    "noncentral_f": lambda key, shape, dtype, dfnum, dfden, nonc: (
        (_noncentral_chisquare(key, shape, dtype, dfnum, nonc) / dfnum)
        / (jr.chisquare(jr.fold_in(key, 1), dfden, shape, dtype) / dfden)
    ),
}


def _negative_binomial(key, shape, dtype, n, p):
    k1, k2 = jr.split(key)
    lam = jr.gamma(k1, n, shape, jnp.float32) * ((1.0 - p) / p)
    return jr.poisson(k2, lam, shape).astype(dtype)


def _noncentral_chisquare(key, shape, dtype, df, nonc):
    k1, k2 = jr.split(key)
    central = jr.chisquare(k1, df - 1.0, shape, dtype)
    shifted = (jr.normal(k2, shape, dtype) + jnp.sqrt(nonc)) ** 2
    return central + shifted


def supported(name: str) -> bool:
    return name in _DISTS


@functools.lru_cache(maxsize=None)
def sample(dist_name: str, shape: tuple, dtype_name: str, sharding):
    impl = _DISTS[dist_name]
    dtype = jnp.dtype(dtype_name)
    fn = jax.jit(
        lambda key, *args: impl(key, shape, dtype, *args),
        out_shardings=sharding,
    )
    return fn


@functools.lru_cache(maxsize=None)
def integers(shape: tuple, dtype_name: str, endpoint: bool, sharding):
    dtype = jnp.dtype(dtype_name)

    def impl(key, low, high):
        hi = high + 1 if endpoint else high
        return jr.randint(key, shape, low, hi, dtype)

    return jax.jit(impl, out_shardings=sharding)


@functools.lru_cache(maxsize=None)
def permutation(n: int, sharding):
    return jax.jit(
        lambda key: jr.permutation(key, n), out_shardings=sharding
    )
