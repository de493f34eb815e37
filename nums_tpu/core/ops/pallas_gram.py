"""Pallas TPU kernel: streaming gram matrix  G = XᵀX.

The headline op of the reference's benchmark 1 (x.T @ x,
scripts/benchmark_bop.py): streams X through VMEM once, accumulating in a
VMEM scratch across grid steps (reduction-grid pattern), so HBM traffic is
exactly one read of X plus one write of G.

Status: OPT-IN (``NUMS_TPU_PALLAS_GRAM=1``). Measured on v5e at
N=1M×1000 fp32: this kernel 28ms vs XLA dot_general 14.7ms (69% of bf16
peak) — XLA's reduction splitting beats the single-accumulator stream on
one chip, so XLA stays the default. Kept as the starting point for the
multi-chip fused collective-matmul variant (where manual control pays).
"""

import os

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gram_kernel(x_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    chunk = x_ref[:]
    acc_ref[:] += jax.lax.dot_general(
        chunk, chunk,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def enabled() -> bool:
    return os.environ.get("NUMS_TPU_PALLAS_GRAM", "0") not in ("0", "", "false")


@functools.lru_cache(maxsize=None)
def _gram_call(n, d, row_tile):
    grid = (n // row_tile,)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        _gram_kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((d, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * d,
            bytes_accessed=n * d * 4 + d * d * 4,
            transcendentals=0,
        ),
    )


def supported(shape, dtype) -> bool:
    if len(shape) != 2:
        return False
    n, d = shape
    # Accumulator (padded to 128 lanes) + double-buffered input tile must
    # fit VMEM (~16MB/core budget).
    d_pad = -(-d // 128) * 128
    if d_pad * d_pad * 4 > 8 * 1024 * 1024:
        return False
    return str(dtype) == "float32" and n >= 512


def _pick_row_tile(n, d):
    # Aim for ~2MB input tiles, 8-row aligned, at least 4 grid steps.
    d_pad = max(128, -(-d // 128) * 128)
    rows = max(8, (2 * 1024 * 1024) // (d_pad * 4))
    rows = min(rows, max(8, n // 4))
    return max(8, (rows // 8) * 8)


@functools.lru_cache(maxsize=None)
def gram_fn(n, d):
    """Jitted G = XᵀX for fp32 (n, d); pads rows to the tile size."""
    row_tile = _pick_row_tile(n, d)

    def impl(x):
        m = x.shape[0]
        num = -(-m // row_tile)
        padded = num * row_tile
        if padded != m:
            x = jnp.concatenate(
                [x, jnp.zeros((padded - m, d), x.dtype)], axis=0
            )
        return _gram_call(padded, d, row_tile)(x)

    return jax.jit(impl)


def gram(x):
    return gram_fn(int(x.shape[0]), int(x.shape[1]))(x)
