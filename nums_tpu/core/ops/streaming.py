"""Streaming accumulation kernels for out-of-core (DiskArray) ops.

Each kernel is a jitted update step applied once per row panel; the
accumulator argument is DONATED so XLA updates it in place — peak HBM
stays O(panel + accumulator) regardless of the dataset's total size.
Matmul precision follows the global ``NUMS_TPU_MATMUL_PRECISION``
setting like every other GEMM kernel.
"""

import functools

import jax
import jax.numpy as jnp

from nums_tpu.core.ops import linalg as _linalg


@functools.lru_cache(maxsize=None)
def gram_update():
    """G += panelᵀ panel.

    Per-shape dispatch (at trace time): a lane-aligned fp32 panel —
    what ``gram_ooc`` transfers when the symmetric Pallas kernel is
    enabled — contracts via the upper-triangular-only kernel; anything
    else (unaligned width, ragged tail panel too short to stream,
    other dtypes) takes the XLA dot. Both routes compute the same
    logical values (pad columns are zero), so mixed panels are fine.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def k(G, panel):
        return G + _sym_gram(panel)

    return k


def _sym_gram(panel):
    """panelᵀ panel with per-shape dispatch (trace time): lane-aligned
    fp32 panels ride the symmetric Pallas kernel, everything else takes
    the XLA dot. Pad columns, if any, are zero, so both routes compute
    the same logical values."""
    from nums_tpu.core.ops import pallas_gram

    shp = (int(panel.shape[0]), int(panel.shape[1]))
    if pallas_gram.enabled() and pallas_gram.supported(shp, panel.dtype):
        return pallas_gram.gram(panel)
    return panel.T @ panel


@functools.lru_cache(maxsize=None)
def gram_and_sum_update():
    """(G, s) += (panelᵀ panel, panel.sum(0)) — the moments PCA needs,
    in ONE pass over the data."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def k(G, s, panel):
        return G + _sym_gram(panel), s + panel.sum(axis=0)

    return k


@functools.lru_cache(maxsize=None)
def normal_eq_update():
    """(G, b) += (panelᵀ panel, panelᵀ y_panel) — normal equations."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def k(G, b, panel, y_panel):
        return G + _sym_gram(panel), b + panel.T @ y_panel

    return k


@functools.lru_cache(maxsize=None)
def normal_eq_aug_update():
    """Intercept-AUGMENTED normal equations: with pa = [panel, 1],
    (G, q) += (paᵀ pa, paᵀ y) — one pass yields everything the linear
    ADMM (lasso/elastic-net) solve needs."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def k(G, q, panel, y_panel, nv):
        # Pad rows (sharded puts round rows up) must contribute ZERO —
        # their panel entries are zero-filled, and the intercept column
        # is the row-validity mask instead of plain ones.
        ones = (
            jnp.arange(panel.shape[0]) < nv
        ).astype(panel.dtype)[:, None]
        pa = jnp.concatenate([panel, ones], axis=1)
        return G + pa.T @ pa, q + pa.T @ y_panel

    return k


@functools.lru_cache(maxsize=None)
def reduce0_update(op: str):
    """acc = combine(acc, reduce(panel, axis=0)) for sum/min/max."""
    red = {"sum": jnp.sum, "min": jnp.min, "max": jnp.max}[op]
    comb = {"sum": jnp.add, "min": jnp.minimum, "max": jnp.maximum}[op]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def k(acc, panel):
        return comb(acc, red(panel, axis=0))

    return k


@functools.lru_cache(maxsize=None)
def tsqr_r_update(chunk: int):
    """R = qr_r([R; panel]) — Householder combine, numerically robust
    for any conditioning (the gram path is the fast alternative)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def k(R, panel):
        stacked = jnp.concatenate([R, panel], axis=0)
        return _linalg._tsqr_r_impl(stacked, chunk)

    return k


@functools.lru_cache(maxsize=None)
def glm_stats_update(kind: str):
    """Accumulate Newton statistics for one intercept-augmented panel.

    g += [p, 1]ᵀ (mu − y);  H += ([p, 1] · s)ᵀ [p, 1]
    with mu, s per GLM kind — the streaming form of
    ``fast_glm._newton_step_penalized``'s per-iteration math.
    """

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def k(g, H, panel, y_panel, beta, nv):
        # Pad rows are zero-filled and their intercept entry is masked
        # to zero, so every pad contribution to g and H vanishes.
        ones = (
            jnp.arange(panel.shape[0]) < nv
        ).astype(panel.dtype)[:, None]
        pa = jnp.concatenate([panel, ones], axis=1)
        eta = pa @ beta
        if kind == "logistic":
            mu = jax.nn.sigmoid(eta)
            s = mu * (1.0 - mu)
        elif kind == "linear":
            mu = eta
            s = jnp.ones_like(eta)
        elif kind == "poisson":
            mu = jnp.exp(eta)
            s = mu
        else:
            raise ValueError(kind)
        g = g + pa.T @ (mu - y_panel)
        H = H + (pa * s[:, None]).T @ pa
        return g, H

    return k


@functools.lru_cache(maxsize=None)
def glm_stats_update_aug(kind: str):
    """``glm_stats_update`` for panels that arrive ALREADY
    intercept-augmented (and possibly lane-padded) from
    ``ooc_put(augment_ones=True, lane_pad_to=...)`` — serial backend
    only (no pad rows to mask). The Hessian contraction rides the
    symmetric Pallas kernel as gram(√s·pa) when the panel shape
    qualifies; pad columns are zero so every pad entry of g and H is
    exactly zero either way."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def k(g, H, pa, y_panel, beta):
        from nums_tpu.core.ops import pallas_gram, pallas_newton

        shp = (int(pa.shape[0]), int(pa.shape[1]))
        if pallas_newton.enabled() and pallas_newton.supported(
            shp, pa.dtype
        ):
            # Fused one-pass panel stats: eta, link chain, g, and the
            # weighted symmetric Hessian from a SINGLE HBM read of the
            # panel (the chain below reads it three times).
            pg, pH = pallas_newton.stats(pa, y_panel, beta, kind)
            return g + pg, H + pH
        eta = pa @ beta
        if kind == "logistic":
            mu = jax.nn.sigmoid(eta)
            s = mu * (1.0 - mu)
        elif kind == "linear":
            mu = eta
            s = jnp.ones_like(eta)
        elif kind == "poisson":
            mu = jnp.exp(eta)
            s = mu
        else:
            raise ValueError(kind)
        g = g + pa.T @ (mu - y_panel)
        # linear's Hessian weight is identically 1: the unweighted gram
        # is the same math without streaming an (n,) ones vector through
        # the scaled kernel (or a second compiled kernel variant).
        if pallas_gram.enabled() and pallas_gram.supported(shp, pa.dtype):
            # Per-row Hessian weight fused into the kernel's VMEM pass
            # (no materialized √s·pa panel copy).
            H = H + pallas_gram.gram(pa, None if kind == "linear" else s)
        elif kind == "linear":
            H = H + pa.T @ pa
        else:
            H = H + (pa * s[:, None]).T @ pa
        return g, H

    return k


@functools.lru_cache(maxsize=None)
def newton_update(penalized: bool, pad_from: int = None):
    """beta' = beta − (H + diag(λ))⁻¹ (g + λ∘beta); returns max|g|.

    ``pad_from``: lane-padded stats — H's pad rows/cols are zero; give
    them a unit diagonal so the Cholesky stays positive-definite (g and
    beta pads are zero, so the step's pad entries stay exactly zero)."""

    @jax.jit
    def k(beta, g, H, lambda_vec):
        if penalized:
            g = g + lambda_vec * beta
            H = H + jnp.diag(lambda_vec)
        if pad_from is not None:
            pad = (jnp.arange(H.shape[0]) >= pad_from).astype(H.dtype)
            H = H + jnp.diag(pad)
        step = _linalg._posdef_solve_impl(H, g)
        return beta - step, jnp.max(jnp.abs(g))

    return k
