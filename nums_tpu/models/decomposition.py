"""TPU-native dimensionality reduction: PCA and TruncatedSVD.

Beyond the reference's model zoo (it ships GLMs plus an empty trees
placeholder; no decomposition models), but a natural fit here: both
models ride the distributed tall-skinny SVD
(``ArrayApplication.svd`` → TSQR/CholeskyQR2 tree, the framework's
linalg north star), so fitting an (n, d) matrix with n ≫ d costs one
streamed pass over X — per-shard panel factorizations + a d×d SVD of R
— with no n×n or host-side materialization anywhere. All derived ops
(centering, projection, reconstruction) are BlockArray expressions:
they fuse through lazy batching and run on either backend.

sklearn-compatible surface: fit / transform / fit_transform /
inverse_transform, components_, explained_variance_(ratio_),
singular_values_, mean_, whiten.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from nums_tpu.core.application_manager import instance as _instance
from nums_tpu.core.array.blockarray import BlockArray
from nums_tpu.models._common import _to_ba


@functools.lru_cache(maxsize=None)
def _flip_kernel():
    """Deterministic sign convention (sklearn's svd_flip, u-based):
    each left-singular column's max-|.| entry is made positive; vt rows
    flip to match so u @ diag(s) @ vt is unchanged."""

    def k(u, vt):
        idx = jnp.argmax(jnp.abs(u), axis=0)
        signs = jnp.sign(u[idx, jnp.arange(u.shape[1])])
        signs = jnp.where(signs == 0, 1.0, signs).astype(u.dtype)
        return u * signs[None, :], vt * signs[:, None]

    return jax.jit(k)


class _BaseSVDModel:
    def __init__(self, n_components=None, svd_solver="full",
                 n_oversamples=10, power_iters=2, seed=0):
        assert svd_solver in ("full", "randomized"), svd_solver
        self.n_components = n_components
        self.svd_solver = svd_solver
        self.n_oversamples = int(n_oversamples)
        self.power_iters = int(power_iters)
        self.seed = int(seed)
        self.components_ = None
        self.singular_values_ = None
        self.explained_variance_ = None
        self.explained_variance_ratio_ = None
        self.n_components_ = None
        self.n_samples_ = None

    def _svd(self, X, k):
        """Distributed SVD with the deterministic sign fix — exact
        (TSQR tree) by default, or the Halko randomized sketch
        (``svd_solver='randomized'``) returning exactly k triplets when
        both dimensions are large."""
        app = _instance()
        if self.svd_solver == "randomized" and k < min(X.shape):
            u, s, vt = app.randomized_svd(
                X, k, n_oversamples=self.n_oversamples,
                n_iter=self.power_iters, seed=self.seed,
            )
        else:
            u, s, vt = app.svd(X)
        ud, vtd = _flip_kernel()(u.data, vt.data)
        u = BlockArray.from_jax(
            ud, block_shape=u.block_shape, backend=u.backend
        )
        vt = BlockArray.from_jax(
            vtd, block_shape=vt.block_shape, backend=vt.backend
        )
        return u, s, vt

    def _resolve_k(self, X):
        k = self.n_components
        if k is None:
            k = min(X.shape)
        k = int(k)
        assert 1 <= k <= min(X.shape), (k, X.shape)
        return k

    def fit(self, X):
        self._fit(_to_ba(X))
        return self

    def fit_transform(self, X):
        X = _to_ba(X)
        u, s = self._fit(X)
        # u[:, :k] * s[:k] — already computed by the fit's SVD; no second
        # pass over X.
        k = self.n_components_
        return u[:, :k] * s[:k]

    def transform(self, X):
        assert self.components_ is not None, "fit must be called first"
        X = _to_ba(X)
        return self._center(X) @ self.components_.T

    def inverse_transform(self, X):
        assert self.components_ is not None, "fit must be called first"
        X = _to_ba(X)
        return self._uncenter(X @ self.components_)

    # Centering hooks (identity for TruncatedSVD).
    def _center(self, X):
        return X

    def _uncenter(self, X):
        return X


class TruncatedSVD(_BaseSVDModel):
    """Truncated SVD (a.k.a. LSA): no centering — works directly on the
    (possibly non-centered) data matrix."""

    def _fit(self, X):
        assert X.ndim == 2
        app = _instance()
        n = X.shape[0]
        k = self._resolve_k(X)
        u, s, vt = self._svd(X, k)
        self.n_samples_ = n
        self.n_components_ = k
        self.components_ = vt[:k]
        self.singular_values_ = s[:k]
        # sklearn TruncatedSVD semantics: explained_variance_ is the
        # per-column variance of the TRANSFORMED data (np.var, ddof=0),
        # not s²/(n−1) — for non-centered X (the typical TruncatedSVD
        # input) the two differ wildly because the leading singular
        # value absorbs the mean offset.
        self.explained_variance_ = app.var(u[:, :k] * s[:k], axis=0)
        total_var = app.sum(app.var(X, axis=0))
        self.explained_variance_ratio_ = self.explained_variance_ / total_var
        return u, s


class PCA(_BaseSVDModel):
    """Principal component analysis via distributed centered SVD.

    ``whiten=True`` scales projections to unit component-wise variance.
    """

    def __init__(self, n_components=None, whiten=False, **solver_kwargs):
        super().__init__(n_components, **solver_kwargs)
        self.whiten = bool(whiten)
        self.mean_ = None
        self.noise_variance_ = None

    def _fit(self, X):
        assert X.ndim == 2
        app = _instance()
        n, d = X.shape
        k = self._resolve_k(X)
        self.mean_ = app.mean(X, axis=0)
        Xc = X - self.mean_
        u, s, vt = self._svd(Xc, k)
        self.n_samples_ = n
        self.n_components_ = k
        self.components_ = vt[:k]
        self.singular_values_ = s[:k]
        ev_k = (s[:k] * s[:k]) / float(n - 1)
        # Total variance directly (== Σ all eigenvalues exactly); works
        # whether the solver returned all or only the top-k values.
        total_var = app.sum(app.var(X, axis=0, ddof=1))
        self.explained_variance_ = ev_k
        self.explained_variance_ratio_ = ev_k / total_var
        # Average variance in the dropped subspace (sklearn's
        # noise_variance_; 0 when k == min(n, d)).
        if k < min(n, d):
            self.noise_variance_ = (total_var - app.sum(ev_k)) / float(
                min(n, d) - k
            )
        else:
            self.noise_variance_ = app.scalar(0.0)
        return u, s

    def _center(self, X):
        return X - self.mean_

    def _uncenter(self, X):
        return X + self.mean_

    def transform(self, X):
        out = super().transform(X)
        if self.whiten:
            out = out / (self.singular_values_ / float(
                np.sqrt(self.n_samples_ - 1)
            ))
        return out

    def fit_transform(self, X):
        out = super().fit_transform(X)
        if self.whiten:
            out = out / (self.singular_values_ / float(
                np.sqrt(self.n_samples_ - 1)
            ))
        return out

    def inverse_transform(self, X):
        if self.whiten:
            X = _to_ba(X) * (
                self.singular_values_ / float(np.sqrt(self.n_samples_ - 1))
            )
        return super().inverse_transform(X)
