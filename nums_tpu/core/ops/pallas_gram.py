"""Pallas TPU kernel: symmetric streaming gram matrix  G = XᵀX.

The headline op of the reference's benchmark 1 (x.T @ x,
scripts/benchmark_bop.py). Design (round 4 — the round-2 full-gram
stream lost to XLA and was demoted; this one exploits what XLA cannot):

* **Symmetry**: G is symmetric, so only the upper-triangular 128×128
  tile pairs are computed — t(t+1)/2 of t² tiles (36/64 at d=1024, a
  44% FLOP cut). XLA's dot_general has no way to express this. The
  lower triangle is mirrored by one elementwise ``where`` afterwards.
* **Single-pass bf16 MACs, f32 accumulation** — the same effective
  precision as jnp's DEFAULT matmul precision on TPU (one bf16 pass),
  which is what the default XLA path runs. The round-2 kernel did f32
  dot_general (3 MXU passes) and was ~2× slower for that reason alone.
* **One HBM read of X**: row chunks stream through VMEM (Pallas
  double-buffers the k-sequential blocks automatically); the f32→bf16
  cast happens on-chip (casting in HBM would add a 1.5× traffic copy).
  The (d_pad, d_pad) accumulator lives in VMEM for the whole grid and
  is written back once.
* **Static unroll** of the tile-pair loop: every slice offset is a
  compile-time constant (no dynamic-slice overhead; Mosaic pipelines
  the 36 MXU ops per chunk back-to-back).

Measured on v5e at N=1M, d=1024 fp32: this kernel 13.6 ms vs XLA
dot_general 18.5 ms (1.36×), compiled with ZERO temp HBM (the input is
consumed in place). Constraint: d must be a multiple of 128 — for
unaligned d Mosaic needs a whole-array relayout copy that is both
slower and 2× the HBM footprint (see ``_plan``), so those shapes stay
on XLA. Unaligned-width WORKLOADS still ride the kernel by making the
buffer aligned with zero pad columns (which contribute zero to the
contraction): at-rest lane padding for BlockArrays
(NUMS_TPU_LANE_PAD — the d=1000 headline bench), host-side panel
padding for the OOC streaming paths (``ooc_put(lane_pad_to=...)``),
and padded generation in the benchmark scripts.
"""

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
# VMEM budget (bytes) for x-chunk double buffer + bf16 scratch + the
# resident (d_pad, d_pad) f32 accumulator; v5e has ~16 MB/core.
# Measured on v5e 2026-08-19 (result_pallas_gram_tpu.csv rows sweep,
# 200k x 1024): best min_s plateau at rows 512-896 (0.0416-0.0418 s),
# 128/256 rows 5-20% slower (grid overhead), and the true scoped-VMEM
# ceiling sits just above the plan (rows=1408 compiles to 19.0M > 16M
# and is rejected by Mosaic; the plan's rows=920 leaves ~1.2 MB
# headroom). 13 MB keeps every plan inside the ceiling across d.
VMEM_BUDGET = 13 * 1024 * 1024


def _upper_pairs(t):
    return [(i, j) for i in range(t) for j in range(t) if i <= j]


def _make_kernel(rows, d, n, k_grid, scaled):
    t = d // TILE
    pairs = _upper_pairs(t)
    tail = n - (k_grid - 1) * rows  # valid rows in the last block

    def body(x_ref, s_ref, out_ref, xb_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # One on-chip cast per chunk; every pair slices the bf16 copy.
        # The optional per-row scale rides along IN VMEM: gram(√s·x)
        # without ever materializing √s·x in HBM — that write+read of
        # the whole (n, d) buffer was one extra HBM pass per Newton
        # iteration (VERDICT r4 weak #4). Scale in f32, then cast —
        # the same math as the materialized route, fused.
        x = x_ref[:]
        if scaled:
            x = x * jnp.sqrt(s_ref[:])  # (rows, 1) broadcasts over lanes
        xb_ref[:] = x.astype(jnp.bfloat16)
        if tail != rows:  # ragged last block: Pallas pads the block
            # with unspecified values — zero them in the bf16 copy so
            # they contribute nothing (NO jnp.pad of the 10GB input).
            # This also erases any NaN from √(garbage) in the s pad.
            @pl.when(k == k_grid - 1)
            def _():
                xb_ref[tail:, :] = jnp.zeros(
                    (rows - tail, xb_ref.shape[1]), jnp.bfloat16
                )
        for ti, tj in pairs:  # static unroll: constant slice offsets
            i0, j0 = ti * TILE, tj * TILE
            prod = jax.lax.dot_general(
                xb_ref[:, i0:i0 + TILE], xb_ref[:, j0:j0 + TILE],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[i0:i0 + TILE, j0:j0 + TILE] = (
                out_ref[i0:i0 + TILE, j0:j0 + TILE] + prod
            )

    if scaled:
        return body

    def kernel(x_ref, out_ref, xb_ref):
        body(x_ref, None, out_ref, xb_ref)

    return kernel


@functools.lru_cache(maxsize=None)
def _gram_call(n, d, rows, scaled=False):
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
    in_specs = [
        pl.BlockSpec((rows, d), lambda k: (k, 0),
                     memory_space=pltpu.VMEM),
    ]
    if scaled:
        # Minor dim 1 == the s operand's FULL minor dim (allowed where
        # arbitrary sub-128 widths are not).
        in_specs.append(
            pl.BlockSpec((rows, 1), lambda k: (k, 0),
                         memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        _make_kernel(rows, d, n, k_grid, scaled),
        grid=(k_grid,),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((d, d), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, d), jnp.bfloat16)],
        compiler_params=params,
        cost_estimate=pl.CostEstimate(
            flops=2 * k_grid * rows * TILE * TILE * n_pairs,
            bytes_accessed=n * d * 4 + d * d * 4 + (n * 4 if scaled else 0),
            transcendentals=0,
        ),
    )


def enabled() -> bool:
    """auto (default): ON when the default backend is a real TPU — the
    kernel's single-pass-bf16 accumulation matches the DEFAULT matmul
    precision XLA uses there, so accuracy class is unchanged while the
    symmetric schedule cuts the MXU work ~44%. On CPU backends XLA's
    f32 matmul is exact, so auto stays OFF (the kernel would degrade
    oracle accuracy). NUMS_TPU_PALLAS_GRAM=1 forces on (interpret mode
    on CPU), =0 forces off."""
    env = os.environ.get("NUMS_TPU_PALLAS_GRAM", "auto")
    if env in ("0", "false", ""):
        return False
    if env in ("1", "true"):
        return True
    # An explicit high-precision matmul request opts OUT: the kernel's
    # MACs are single-pass bf16 (the DEFAULT precision class). A user
    # who set jax_default_matmul_precision to tensorfloat32/float32/
    # highest asked for multi-pass accuracy and must get XLA's
    # decomposition, not a silent bf16 gram.
    try:
        prec = jax.config.jax_default_matmul_precision
    except Exception:  # pragma: no cover - config attr is stable
        prec = None
    if prec not in (None, "default", "fastest", "bfloat16"):
        return False
    # "axon" is the experimental remote-TPU PJRT plugin platform name:
    # same v5e hardware, Mosaic-capable (the kernel's A/B numbers were
    # measured through it).
    return jax.default_backend() in ("tpu", "axon")


def _plan(n, d, scaled=False):
    """(rows, d) chunking, or None if the shape doesn't fit.

    d must be lane-aligned (multiple of 128): Mosaic requires VMEM
    block widths aligned to the (8, 128) tiling, and for unaligned d
    XLA inserts a whole-array relayout copy before the kernel —
    measured BOTH slower (26.6 vs 17.8 ms at 1M×1000) and a 2× HBM
    footprint (OOM at the 2.5M×1000 headline size). Aligned widths run
    zero-copy (compiled temp = 0 bytes, verified via memory_analysis).
    """
    if d % TILE != 0:
        return None
    acc = d * d * 4
    # Largest 8-row-aligned chunk whose double-buffered f32 block plus
    # bf16 scratch fits the budget next to the resident accumulator.
    per_row = d * 4 * 2 + d * 2
    if scaled:
        # The weighted kernel's ``x * sqrt(s)`` needs a (rows, d) f32
        # product temp on the Mosaic stack before the bf16 cast, plus
        # the double-buffered (rows, 1) s blocks. Sharing the unscaled
        # plan overflowed scoped VMEM at small d (big rows): 17.83M
        # > 16M at (1M, 256) on v5e, round-5 hardware sweep.
        per_row += d * 4 + 4 * 2
    rows = (VMEM_BUDGET - acc) // per_row
    rows = min(rows, max(8, n // 4))  # at least 4 chunks to stream
    rows = max(8, (rows // 8) * 8)
    if rows < 128:
        return None  # accumulator too big, or too few rows to stream
    return int(rows), int(d)


def supported(shape, dtype, scaled=False) -> bool:
    """``scaled=True`` checks the WEIGHTED variant's (tighter) VMEM
    plan — callers that will pass a per-row scale must use it."""
    if len(shape) != 2:
        return False
    n, d = int(shape[0]), int(shape[1])
    if np.dtype(dtype) != np.float32:
        return False
    return _plan(n, d, scaled) is not None


def plan_possible(d) -> bool:
    """Plan-level check: can a (n, d) f32 gram EVER ride the kernel for
    some n? Gates pad-width decisions (e.g. the OOC panel widener) so
    they don't pay host-side padding for a width ``supported()`` will
    reject anyway — for large d the resident (d, d) f32 accumulator
    alone busts the VMEM plan."""
    return _plan(1 << 30, int(d)) is not None


@functools.lru_cache(maxsize=None)
def gram_fn(n, d, scaled=False):
    """Jitted G = XᵀX (or Xᵀ·diag(s)·X with ``scaled``) for fp32 (n, d):
    the kernel consumes x as-is (ragged row/column tiles are handled
    in-kernel — padding a 10GB input with jnp.pad would double HBM) and
    the upper-triangular tiles mirror into the lower triangle with one
    elementwise where."""
    rows, _ = _plan(n, d, scaled)

    def impl(x, s=None):
        if scaled:
            u = _gram_call(n, d, rows, True)(
                x, s.astype(jnp.float32).reshape(n, 1)
            )
        else:
            u = _gram_call(n, d, rows)(x)
        blk = jnp.arange(d) // TILE
        mask = blk[:, None] <= blk[None, :]
        return jnp.where(mask, u, u.T)

    return jax.jit(impl)


def gram(x, s=None):
    """G = XᵀX, or the weighted gram Xᵀ·diag(s)·X when ``s`` (shape
    (n,), non-negative — a GLM Hessian weight) is given. The weighted
    form scales rows by √s inside the kernel's VMEM pass, saving the
    full extra HBM write+read that materializing √s·X costs."""
    n, d = int(x.shape[0]), int(x.shape[1])
    if s is None:
        return gram_fn(n, d)(x)
    if _plan(n, d, scaled=True) is not None:
        return gram_fn(n, d, scaled=True)(x, s)
    # The weighted plan's extra f32 product temp doesn't fit VMEM at
    # this d, but the unscaled kernel does: materialize √s·x once
    # (one extra HBM round trip) and keep the ~44% symmetric FLOP cut.
    xs = x * jnp.sqrt(s.astype(x.dtype))[:, None]
    return gram_fn(n, d)(xs)
