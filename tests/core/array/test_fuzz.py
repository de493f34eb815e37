"""Deterministic op-sequence fuzzer: random chains of array ops applied
in lockstep to a NumPy oracle. Catches wrapper-composition bugs (metadata
drift, lazy-transpose interactions, block-shape bookkeeping) that
single-op tests can't."""

import numpy as np
import pytest


def _apply(rng, np_x, ba_x, app):
    """Pick one op valid for the current shape; apply to both."""
    ops = ["uop", "scalar_bop", "reduce", "slice"]
    if np_x.ndim == 2:
        ops += ["transpose", "matmul_self", "bop_self"]
    if np_x.ndim >= 1 and np_x.size >= 4:
        ops.append("reshape2")
    op = ops[rng.randint(len(ops))]

    if op == "uop":
        f = ["abs", "exp", "tanh", "square"][rng.randint(4)]
        return getattr(np, f)(np_x), ba_x.ufunc(f)
    if op == "scalar_bop":
        c = float(rng.randn())
        which = rng.randint(3)
        if which == 0:
            return np_x + c, ba_x + c
        if which == 1:
            return np_x * c, ba_x * c
        return c - np_x, c - ba_x
    if op == "reduce":
        if np_x.ndim == 0:
            return np_x, ba_x
        ax = rng.randint(np_x.ndim)
        if rng.randint(2):
            return np_x.sum(axis=ax), ba_x.sum(axis=ax)
        return np_x.mean(axis=ax), ba_x.mean(axis=ax)
    if op == "slice":
        if np_x.ndim == 0 or np_x.shape[0] < 2:
            return np_x, ba_x
        lo = rng.randint(np_x.shape[0] - 1)
        hi = lo + 1 + rng.randint(np_x.shape[0] - lo - 1) if (
            np_x.shape[0] - lo - 1
        ) else lo + 1
        return np_x[lo:hi], ba_x[lo:hi]
    if op == "transpose":
        return np_x.T, ba_x.T
    if op == "matmul_self":
        return np_x @ np_x.T, ba_x @ ba_x.T
    if op == "bop_self":
        return np_x - 0.5 * np_x, ba_x - 0.5 * ba_x
    if op == "reshape2":
        n = np_x.size
        for d in (2, 3, 4, 5):
            if n % d == 0:
                return np_x.reshape(d, n // d), ba_x.reshape(d, n // d)
        return np_x.reshape(n), ba_x.reshape(n)
    raise AssertionError(op)


@pytest.mark.parametrize("seed", range(8))
def test_op_sequence_fuzz(app_inst, seed):
    rng = np.random.RandomState(seed)
    np_x = rng.randn(8, 6)
    ba_x = app_inst.array(np_x, block_shape=(4, 3))
    for step in range(12):
        np_x, ba_x = _apply(rng, np_x, ba_x, app_inst)
        # keep magnitudes tame so exp/square chains don't overflow
        if np.max(np.abs(np_x)) > 1e3:
            np_x = np_x / 1e3
            ba_x = ba_x / 1e3
        assert ba_x.shape == np_x.shape, (seed, step)
        assert np.allclose(
            ba_x.get(), np_x, atol=1e-8, equal_nan=True
        ), (seed, step)

@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8, 40))
def test_op_sequence_fuzz_deep(app_inst, seed):
    rng = np.random.RandomState(seed)
    np_x = rng.randn(8, 6)
    ba_x = app_inst.array(np_x, block_shape=(4, 3))
    for step in range(25):
        np_x, ba_x = _apply(rng, np_x, ba_x, app_inst)
        if np.max(np.abs(np_x)) > 1e3:
            np_x = np_x / 1e3
            ba_x = ba_x / 1e3
        assert ba_x.shape == np_x.shape, (seed, step)
        assert np.allclose(
            ba_x.get(), np_x, atol=1e-8, equal_nan=True
        ), (seed, step)
