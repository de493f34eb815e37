"""NumsRandomState: the stateful RNG facade over counter-based sampling.

Parity: ``nums/core/array/random.py:24-195``. Same surface (seed mgmt, the
full distribution set, ``numpy()`` escape hatch, ``permutation``), but
sampling is one jitted whole-array program per call instead of one PCG64
jump-ahead task per block — "same seed ⇒ same array regardless of block
shape" (the reference's goal at numpy_compute.py:56-68) holds structurally.
"""

import numpy as np

import jax.random as jr

from nums_tpu.core.array import utils as array_utils
from nums_tpu.core.array.blockarray import BlockArray
from nums_tpu.core.grid import ArrayGrid
from nums_tpu.core.ops import random_ops


# Distributions with no practical jit transform; sampled on host with a
# deterministically-derived NumPy generator, then device_put.
_HOST_DISTS = {
    "hypergeometric": lambda rng, args, shape: rng.hypergeometric(
        *args, size=shape
    ),
}


class NumsRandomState:
    def __init__(self, backend, seed=None):
        self._backend = backend
        self.seed(seed)

    def seed(self, seed=None):
        if seed is None:
            seed = np.random.SeedSequence().entropy % (2**63)
        self._seed = int(seed)
        self._key = jr.key(self._seed)
        self._counter = 0

    def numpy(self):
        """Host-side NumPy generator escape hatch (parity: random.py:34-37)."""
        return np.random.default_rng(self._seed)

    def get_state(self):
        """Engine state as a dict. The engine is counter-based threefry
        (not MT19937), so the state is (seed, stream counter) — enough to
        reproduce or resume the stream exactly on any backend."""
        return {
            "bit_generator": "threefry2x32",
            "seed": self._seed,
            "counter": self._counter,
        }

    def set_state(self, state):
        assert state.get("bit_generator") == "threefry2x32", state
        self._seed = int(state["seed"])
        self._key = jr.key(self._seed)
        self._counter = int(state["counter"])

    def _next_key(self):
        self._counter += 1
        return jr.fold_in(self._key, self._counter)

    def _grid(self, shape, block_shape, dtype_name):
        shape = tuple(shape) if shape is not None else ()
        if block_shape is None:
            block_shape = shape
        return ArrayGrid(shape, tuple(block_shape), dtype_name)

    def _sample_basic(
        self, rfunc_name, shape, block_shape, dtype, rfunc_args
    ) -> BlockArray:
        """Parity: ``_sample_basic`` (random.py:144-179)."""
        if dtype is None:
            dtype = np.float64
        dtype_name = array_utils.to_dtype_name(dtype)
        grid = self._grid(shape, block_shape, dtype_name)
        sharding = self._backend.sharding_for_grid(grid)
        pshape = self._backend.physical_shape(grid.shape, grid.grid_shape)
        if random_ops.supported(rfunc_name):
            fn = random_ops.sample(
                rfunc_name, grid.shape, dtype_name, sharding, pshape
            )
            data = fn(self._next_key(), *[float(a) for a in rfunc_args])
        elif rfunc_name in _HOST_DISTS:
            self._counter += 1
            rng = np.random.default_rng((self._seed, self._counter))
            arr = _HOST_DISTS[rfunc_name](rng, rfunc_args, grid.shape)
            arr = np.asarray(arr, dtype=np.dtype(dtype_name))
            data = self._backend.device_put(arr, grid)
        else:
            raise NotImplementedError(f"Unknown distribution {rfunc_name}")
        return BlockArray(data, grid, self._backend)

    # -- core samplers ---------------------------------------------------

    def random(self, shape=None, block_shape=None, dtype=None):
        if dtype is None:
            dtype = np.float64
        assert np.dtype(dtype).kind == "f", "random() requires float dtype"
        return self._sample_basic("random", shape, block_shape, dtype, ())

    def integers(
        self, low, high=None, shape=None, block_shape=None, dtype=None,
        endpoint=False,
    ):
        if high is None:
            low, high = 0, low
        if dtype is None:
            dtype = np.int64
        dtype_name = array_utils.to_dtype_name(dtype)
        grid = self._grid(shape, block_shape, dtype_name)
        sharding = self._backend.sharding_for_grid(grid)
        pshape = self._backend.physical_shape(grid.shape, grid.grid_shape)
        fn = random_ops.integers(
            grid.shape, dtype_name, bool(endpoint), sharding, pshape
        )
        data = fn(self._next_key(), int(low), int(high))
        return BlockArray(data, grid, self._backend)

    def uniform(self, low=0.0, high=1.0, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "uniform", shape, block_shape, dtype, (low, high)
        )

    def normal(self, loc=0.0, scale=1.0, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "normal", shape, block_shape, dtype, (loc, scale)
        )

    # -- distribution zoo (parity list: random.py:58-141) ----------------

    def beta(self, a, b, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("beta", shape, block_shape, dtype, (a, b))

    def binomial(self, n, p, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("binomial", shape, block_shape, dtype, (n, p))

    def chisquare(self, df, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("chisquare", shape, block_shape, dtype, (df,))

    def exponential(self, scale=1.0, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "exponential", shape, block_shape, dtype, (scale,)
        )

    def f(self, dfnum, dfden, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "f", shape, block_shape, dtype, (dfnum, dfden)
        )

    def gamma(self, k, theta, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("gamma", shape, block_shape, dtype, (k, theta))

    def geometric(self, p, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("geometric", shape, block_shape, dtype, (p,))

    def gumbel(self, loc=0.0, scale=1.0, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "gumbel", shape, block_shape, dtype, (loc, scale)
        )

    def hypergeometric(
        self, ngood, nbad, nsample, shape=None, block_shape=None, dtype=None
    ):
        nsample = int(nsample)
        if ngood < 0 or nbad < 0 or nsample < 0:
            raise ValueError("ngood, nbad, nsample must be non-negative")
        if int(ngood) + int(nbad) < nsample:
            # numpy raises here; the device chain would silently drive
            # the urn counts negative and return garbage.
            raise ValueError("ngood + nbad < nsample")
        if dtype is None:
            # Both routes default to int64 (numpy returns integers); the
            # host fallback would otherwise hand back float64 whenever
            # nsample crossed the internal perf threshold.
            dtype = np.int64
        if int(ngood) >= 10**9 or int(nbad) >= 10**9:
            # numpy's own cap (Generator.hypergeometric). It also keeps
            # every legal population total under 2e9, inside the device
            # urn's exact int32 range.
            raise ValueError(
                "both ngood and nbad must be less than 1000000000"
            )
        if nsample <= random_ops.HYPERGEOMETRIC_DEVICE_MAX_NSAMPLE:
            dtype_name = array_utils.to_dtype_name(dtype)
            grid = self._grid(shape, block_shape, dtype_name)
            sharding = self._backend.sharding_for_grid(grid)
            pshape = self._backend.physical_shape(
                grid.shape, grid.grid_shape
            )
            fn = random_ops.hypergeometric(
                grid.shape, dtype_name, nsample, sharding, pshape
            )
            data = fn(self._next_key(), float(ngood), float(nbad))
            return BlockArray(data, grid, self._backend)
        # Huge nsample: the O(nsample) device chain loses to the host
        # generator (same posture as the reference's host PCG64 path).
        return self._sample_basic(
            "hypergeometric", shape, block_shape, dtype, (ngood, nbad, nsample)
        )

    def laplace(self, loc=0.0, scale=1.0, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "laplace", shape, block_shape, dtype, (loc, scale)
        )

    def logistic(self, loc=0.0, scale=1.0, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "logistic", shape, block_shape, dtype, (loc, scale)
        )

    def lognormal(self, mean=0.0, sigma=1.0, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "lognormal", shape, block_shape, dtype, (mean, sigma)
        )

    def logseries(self, p, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("logseries", shape, block_shape, dtype, (p,))

    def negative_binomial(self, n, p, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "negative_binomial", shape, block_shape, dtype, (n, p)
        )

    def noncentral_chisquare(self, df, nonc, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "noncentral_chisquare", shape, block_shape, dtype, (df, nonc)
        )

    def noncentral_f(
        self, dfnum, dfden, nonc, shape=None, block_shape=None, dtype=None
    ):
        return self._sample_basic(
            "noncentral_f", shape, block_shape, dtype, (dfnum, dfden, nonc)
        )

    def pareto(self, a, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("pareto", shape, block_shape, dtype, (a,))

    def poisson(self, lam=1.0, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("poisson", shape, block_shape, dtype, (lam,))

    def power(self, a, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("power", shape, block_shape, dtype, (a,))

    def rayleigh(self, scale=1.0, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("rayleigh", shape, block_shape, dtype, (scale,))

    def standard_cauchy(self, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("standard_cauchy", shape, block_shape, dtype, ())

    def standard_t(self, df, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("standard_t", shape, block_shape, dtype, (df,))

    def triangular(self, left, mode, right, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "triangular", shape, block_shape, dtype, (left, mode, right)
        )

    def vonmises(self, mu, kappa, shape=None, block_shape=None, dtype=None):
        return self._sample_basic(
            "vonmises", shape, block_shape, dtype, (mu, kappa)
        )

    def wald(self, mean, scale, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("wald", shape, block_shape, dtype, (mean, scale))

    def weibull(self, a, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("weibull", shape, block_shape, dtype, (a,))

    def zipf(self, a, shape=None, block_shape=None, dtype=None):
        return self._sample_basic("zipf", shape, block_shape, dtype, (a,))

    # -- numpy Generator-style extras (beyond the reference's list) ------

    def standard_normal(self, shape=None, block_shape=None, dtype=None):
        return self.normal(0.0, 1.0, shape, block_shape, dtype)

    def standard_exponential(self, shape=None, block_shape=None, dtype=None):
        return self.exponential(1.0, shape, block_shape, dtype)

    def standard_gamma(self, k, shape=None, block_shape=None, dtype=None):
        return self.gamma(k, 1.0, shape, block_shape, dtype)

    def multivariate_normal(self, mean, cov, shape=None, block_shape=None,
                            dtype=None):
        import jax.numpy as jnp

        if dtype is None:
            dtype = np.float64
        mean = jnp.asarray(np.asarray(mean))
        cov = jnp.asarray(np.asarray(cov))
        shape = tuple(shape) if shape is not None else ()
        out_shape = shape + (mean.shape[-1],)
        grid = self._grid(out_shape, block_shape, array_utils.to_dtype_name(dtype))
        data = jr.multivariate_normal(
            self._next_key(), mean, cov, shape,
            dtype=np.dtype(array_utils.to_dtype_name(dtype)),
        )
        data = self._backend.device_reshard(data, grid)
        return BlockArray(data, grid, self._backend)

    def dirichlet(self, alpha, shape=None, block_shape=None, dtype=None):
        import jax.numpy as jnp

        if dtype is None:
            dtype = np.float64
        alpha = jnp.asarray(np.asarray(alpha, dtype=np.float64))
        shape = tuple(shape) if shape is not None else ()
        out_shape = shape + (alpha.shape[-1],)
        grid = self._grid(out_shape, block_shape, array_utils.to_dtype_name(dtype))
        data = jr.dirichlet(self._next_key(), alpha, shape)
        data = self._backend.device_reshard(
            data.astype(np.dtype(grid.dtype)), grid
        )
        return BlockArray(data, grid, self._backend)

    def multinomial(self, n, pvals, shape=None, block_shape=None, dtype=None):
        """Device-side (jax.random.multinomial over the counter-derived
        key): same-seed determinism under any sharding, like every other
        distribution here.

        NumPy's Generator semantics, validated on host: each pval must
        lie in [0, 1] (no NaNs) and the LAST category's probability is
        the implicit remainder 1 - sum(pvals[:-1]) — jax would instead
        renormalize by the total, a different distribution for
        non-normalized input."""
        import jax.numpy as jnp

        pv = np.asarray(pvals, dtype=np.float64)
        if (
            np.isnan(pv).any() or (pv < 0).any() or (pv > 1).any()
            or (pv[..., :-1].sum(axis=-1) > 1.0 + 1e-12)
        ):
            raise ValueError(
                "pvals < 0, pvals > 1 or pvals contains NaNs"
            )
        pv = pv.copy()
        pv[..., -1] = 1.0 - pv[..., :-1].sum(axis=-1)
        pvals = jnp.asarray(pv)
        n_arr = np.asarray(n)
        shape = tuple(shape) if shape is not None else tuple(n_arr.shape)
        out_dtype = np.dtype(array_utils.to_dtype_name(dtype or np.int64))
        # jr.multinomial's ``shape`` is the FULL output shape (batch
        # dims + the category dim, to which n and p broadcast).
        full = (shape + pv.shape[-1:]) if (shape or n_arr.shape) else None
        data = jr.multinomial(
            self._next_key(), jnp.asarray(n_arr, jnp.float64), pvals,
            shape=full,
        ).astype(out_dtype)
        if full is not None and tuple(data.shape) != tuple(full):
            # jax 0.9.0 treats shape= as the FULL output shape, but its
            # docs say "batch shape excluding the last axis" — if a
            # future jax aligns implementation with docs, fail loudly
            # instead of silently growing an extra category axis.
            raise AssertionError(
                f"jr.multinomial shape semantics changed: expected "
                f"{tuple(full)}, got {tuple(data.shape)}; update the "
                f"shape= handling in RandomState.multinomial"
            )
        data = jnp.atleast_1d(data)
        grid = self._grid(
            tuple(data.shape), block_shape, out_dtype.name
        )
        data = self._backend.device_reshard(data, grid)
        return BlockArray(data, grid, self._backend)

    def choice(self, a, shape=None, block_shape=None, replace=True, p=None):
        import jax.numpy as jnp

        shape = tuple(shape) if shape is not None else ()
        if isinstance(a, BlockArray):
            pool = a.data
        elif isinstance(a, (int, np.integer)):
            pool = int(a)
        else:
            pool = jnp.asarray(np.asarray(a))
        pj = jnp.asarray(np.asarray(p)) if p is not None else None
        data = jr.choice(self._next_key(), pool, shape, replace=replace, p=pj)
        grid = self._grid(tuple(data.shape), block_shape, data.dtype.name)
        return BlockArray(data, grid, self._backend)

    def shuffle(self, x: BlockArray) -> None:
        """IN PLACE along axis 0 (numpy Generator.shuffle contract;
        same in-place convention as BlockArray.sort). Returning a new
        array instead silently de-randomizes numpy-ported code that
        discards the return value."""
        x._store(jr.permutation(self._next_key(), x.data, axis=0))

    def permutation(self, size, block_size=None):
        """Parity: random.py:181-195."""
        grid = self._grid((size,), (block_size or size,), "int64")
        sharding = self._backend.sharding_for_grid(grid)
        pshape = self._backend.physical_shape(grid.shape, grid.grid_shape)
        data = random_ops.permutation(int(size), sharding, pshape)(
            self._next_key()
        )
        # permutation dtype follows jax (int32 without x64); normalize grid.
        grid = ArrayGrid(grid.shape, grid.block_shape, data.dtype.name)
        return BlockArray(data, grid, self._backend)
