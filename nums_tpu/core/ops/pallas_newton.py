"""Pallas TPU kernel: fused one-pass GLM Newton statistics.

One Newton iteration of a GLM (the reference's benchmark 2 —
``scripts/benchmark_lr.py:56-150``, one Newton step of logistic
regression at 2.5M x 1000) needs, per pass over the data:

    eta = X @ beta                (reads X)
    mu, s = link(eta)             (elementwise)
    g  = X^T (mu - y)             (reads X again)
    H  = X^T diag(s) X            (reads X a third time)

X is the only big operand (10 GB at the headline shape) and HBM
bandwidth is the bottleneck: the three contractions above are three
full HBM sweeps of X per iteration even after the symmetric gram
kernel absorbed the Hessian weight (``pallas_gram.py``). This kernel
computes ALL of it in ONE sweep: each (rows, d) chunk is read into
VMEM once, cast to bf16 once, and used for (a) the eta matvec, (b) the
g matvec, and (c) the upper-triangular Hessian tile pairs — the same
symmetric schedule, single-pass bf16 MACs with f32 accumulation, and
at-rest lane-padding contract as the gram kernel (pads are zero, so
every pad entry of g and H is exactly zero).

Accuracy class is unchanged from the XLA route: on TPU, XLA's DEFAULT
matmul precision is single-pass bf16 for all three contractions
already; the elementwise link chain runs in f32 here exactly as XLA
runs it.

Like ``pallas_gram``: fp32 only, d must be a multiple of 128 (lane
alignment — unaligned workloads ride via zero pad columns), and the
(d, d) accumulator must fit the VMEM plan.
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nums_tpu.core.ops import pallas_gram
from nums_tpu.core.ops.pallas_gram import TILE, VMEM_BUDGET

KINDS = ("logistic", "linear", "poisson")


def _link(kind, eta):
    """(mu, s) from eta — the GLM mean and Hessian weight. ``s=None``
    means identity weight (H = X^T X, no per-row scale pass)."""
    if kind == "logistic":
        mu = 1.0 / (1.0 + jnp.exp(-eta))
        return mu, mu * (1.0 - mu)
    if kind == "linear":
        return eta, None
    if kind == "poisson":
        mu = jnp.exp(eta)
        return mu, mu
    raise ValueError(kind)


def _make_kernel(rows, d, n, k_grid, kind):
    t = d // TILE
    pairs = [(i, j) for i in range(t) for j in range(t) if i <= j]
    tail = n - (k_grid - 1) * rows  # valid rows in the last block

    def kernel(x_ref, y_ref, beta_ref, g_ref, h_ref, xb_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            g_ref[:] = jnp.zeros_like(g_ref)
            h_ref[:] = jnp.zeros_like(h_ref)

        # One on-chip f32->bf16 cast per chunk; eta, g, and every tile
        # pair slice this single VMEM copy (see pallas_gram._make_kernel
        # for the ragged-tail contract: Pallas pads the last block with
        # unspecified values, so zero them before any contraction).
        xb_ref[:] = x_ref[:].astype(jnp.bfloat16)
        if tail != rows:
            @pl.when(k == k_grid - 1)
            def _():
                xb_ref[tail:, :] = jnp.zeros(
                    (rows - tail, xb_ref.shape[1]), jnp.bfloat16
                )
        xb = xb_ref[:]
        eta = jax.lax.dot_general(
            xb, beta_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rows, 1)
        mu, s = _link(kind, eta)
        r = mu - y_ref[:]
        if tail != rows:
            # Pad rows: xb is zeroed (so eta=0 and mu is finite), but
            # y's pad values are unspecified — possibly inf/nan, and
            # 0*nan = nan inside the MXU accumulation. Mask r (and s)
            # to zero on every out-of-range row.
            rid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
            valid = (k * rows + rid) < n
            r = jnp.where(valid, r, 0.0)
            if s is not None:
                s = jnp.where(valid, s, 0.0)
        g_ref[:] = g_ref[:] + jax.lax.dot_general(
            xb, r.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, 1)
        if s is not None:
            # Per-row Hessian weight fused in VMEM — overwrites the
            # bf16 copy AFTER g consumed the unscaled rows. Pad rows
            # stay zero (0 * 0).
            xb_ref[:] = xb_ref[:] * jnp.sqrt(s).astype(jnp.bfloat16)
        for ti, tj in pairs:  # static unroll: constant slice offsets
            i0, j0 = ti * TILE, tj * TILE
            prod = jax.lax.dot_general(
                xb_ref[:, i0:i0 + TILE], xb_ref[:, j0:j0 + TILE],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h_ref[i0:i0 + TILE, j0:j0 + TILE] = (
                h_ref[i0:i0 + TILE, j0:j0 + TILE] + prod
            )

    return kernel


@functools.lru_cache(maxsize=None)
def _stats_call(n, d, rows, kind):
    k_grid = -(-n // rows)
    interpret = jax.default_backend() == "cpu"
    t = d // TILE
    n_pairs = t * (t + 1) // 2
    try:
        params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential reduction
        )
    except Exception:  # older spelling
        params = pltpu.TPUCompilerParams(
            dimension_semantics=("arbitrary",),
        )
    return pl.pallas_call(
        _make_kernel(rows, d, n, k_grid, kind),
        grid=(k_grid,),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((rows, d), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            # Minor dim 1 == the operand's FULL minor dim (allowed
            # where arbitrary sub-128 widths are not).
            pl.BlockSpec((rows, 1), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((d, 1), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((d, 1), jnp.float32),
            jax.ShapeDtypeStruct((d, d), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((rows, d), jnp.bfloat16)],
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=(2 * k_grid * rows * TILE * TILE * n_pairs
                   + 2 * 2 * k_grid * rows * d),
            bytes_accessed=(n * d * 4 + n * 4 + d * 4
                            + d * d * 4 + d * 4),
            transcendentals=0 if kind == "linear" else k_grid * rows,
        ),
    )


def enabled() -> bool:
    """auto (default): follows :func:`pallas_gram.enabled` — same
    hardware gate, same bf16-precision opt-out. NUMS_TPU_PALLAS_NEWTON=1
    forces on (interpret mode on CPU), =0 forces off (the eta/g/H chain
    then runs as XLA ops, with the Hessian still riding the gram kernel
    where that one is enabled)."""
    env = os.environ.get("NUMS_TPU_PALLAS_NEWTON", "auto")
    if env in ("0", "false", ""):
        return False
    if env in ("1", "true"):
        return True
    return pallas_gram.enabled()


def _plan(n, d):
    """(rows, d) chunking, or None if the shape doesn't fit.

    Same constraints as ``pallas_gram._plan`` plus the extra VMEM
    residents: the (d, 1) g accumulator, the (d, 1) beta block, and the
    double-buffered (rows, 1) y blocks. The per-row charge also covers
    the Mosaic stack temps the kernel body needs — the (rows, d) bf16
    product of the in-place √s scale and the (rows, 1) eta/mu/r chain —
    which the gram kernel's shared plan undercharged at small d (big
    rows): scoped-VMEM stack OOM at (1M, 256), round-5 hardware sweep."""
    if d % TILE != 0:
        return None
    acc = d * d * 4 + 2 * d * 4
    per_row = d * 4 * 2 + d * 2 + d * 2 + 6 * 4
    rows = (VMEM_BUDGET - acc) // per_row
    rows = min(rows, max(8, n // 4))  # at least 4 chunks to stream
    rows = max(8, (rows // 8) * 8)
    if rows < 128:
        return None
    return int(rows), int(d)


def supported(shape, dtype) -> bool:
    if len(shape) != 2:
        return False
    n, d = int(shape[0]), int(shape[1])
    if np.dtype(dtype) != np.float32:
        return False
    return _plan(n, d) is not None


@functools.lru_cache(maxsize=None)
def stats_fn(n, d, kind):
    """Jitted (g, H) = (X^T(mu - y), X^T diag(s) X) for fp32 (n, d):
    one HBM pass over X; the upper-triangular Hessian tiles mirror into
    the lower triangle with one elementwise where (as gram_fn)."""
    assert kind in KINDS, kind
    rows, _ = _plan(n, d)

    def impl(x, y, beta):
        g, u = _stats_call(n, d, rows, kind)(
            x,
            y.astype(jnp.float32).reshape(n, 1),
            beta.astype(jnp.float32).reshape(d, 1),
        )
        blk = jnp.arange(d) // TILE
        mask = blk[:, None] <= blk[None, :]
        return g.reshape(d), jnp.where(mask, u, u.T)

    return jax.jit(impl)


def stats(x, y, beta, kind):
    """(g, H) for one GLM Newton iteration in a single HBM pass.

    ``x``: fp32 (n, d) — possibly lane-padded with zero pad columns
    (then ``beta``'s pad entries must be zero too, and g/H pad entries
    come out exactly zero). ``y``: (n,). ``beta``: (d,)."""
    n, d = int(x.shape[0]), int(x.shape[1])
    return stats_fn(n, d, kind)(x, y, beta)
