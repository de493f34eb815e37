"""Fused one-pass Newton-stats kernel tests (interpret mode on CPU).

The kernel computes eta = X@beta, the GLM link chain, g = X^T(mu-y),
and the symmetric weighted Hessian in one HBM pass with single-pass
bf16 MACs + f32 accumulation (the DEFAULT TPU matmul precision class),
so oracle comparisons use bf16-class relative tolerance."""

import numpy as np
import pytest

BF16_REL = 4e-3


def _rel(got, oracle):
    scale = max(np.max(np.abs(oracle)), 1e-6)
    return np.max(np.abs(got - oracle)) / scale


def _oracle(kind, x, y, beta):
    eta = x.astype(np.float64) @ beta.astype(np.float64)
    if kind == "logistic":
        mu = 1.0 / (1.0 + np.exp(-eta))
        s = mu * (1.0 - mu)
    elif kind == "linear":
        mu, s = eta, np.ones_like(eta)
    elif kind == "poisson":
        mu = np.exp(eta)
        s = mu
    g = x.T.astype(np.float64) @ (mu - y)
    h = (x * s[:, None].astype(np.float32)).T.astype(np.float64) @ x
    return g, h


@pytest.mark.parametrize("kind", ["logistic", "linear", "poisson"])
def test_stats_matches_numpy(app_inst, kind):
    from nums_tpu.core.ops import pallas_newton
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    n, d = 1024, 128
    x = rs.randn(n, d).astype(np.float32) * 0.1
    y = (rs.rand(n) > 0.5).astype(np.float32)
    beta = rs.randn(d).astype(np.float32) * 0.05
    assert pallas_newton.supported(x.shape, x.dtype)
    g, h = pallas_newton.stats(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(beta), kind
    )
    og, oh = _oracle(kind, x, y, beta)
    assert _rel(np.asarray(g), og) < BF16_REL, kind
    assert _rel(np.asarray(h), oh) < BF16_REL, kind
    assert np.array_equal(np.asarray(h), np.asarray(h).T), kind


def test_stats_ragged_rows(app_inst):
    """n not divisible by the row chunk: pad rows of the last block
    must contribute exactly nothing to g and H."""
    from nums_tpu.core.ops import pallas_newton
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    for n in (1000, 4099):
        d = 256
        x = rs.randn(n, d).astype(np.float32) * 0.1
        y = (rs.rand(n) > 0.5).astype(np.float32)
        beta = rs.randn(d).astype(np.float32) * 0.05
        g, h = pallas_newton.stats(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(beta), "logistic"
        )
        og, oh = _oracle("logistic", x, y, beta)
        assert _rel(np.asarray(g), og) < BF16_REL, n
        assert _rel(np.asarray(h), oh) < BF16_REL, n


def test_stats_lane_padded_zero_pads(app_inst):
    """Zero pad columns (at-rest lane padding) with zero beta pads:
    g and H pad entries must come out EXACTLY zero, and the logical
    corner must equal the unpadded stats."""
    from nums_tpu.core.ops import pallas_newton
    import jax.numpy as jnp

    rs = np.random.RandomState(2)
    n, dl, dp = 999, 100, 128
    x = np.zeros((n, dp), np.float32)
    x[:, :dl] = rs.randn(n, dl).astype(np.float32) * 0.1
    y = (rs.rand(n) > 0.5).astype(np.float32)
    beta = np.zeros(dp, np.float32)
    beta[:dl] = rs.randn(dl).astype(np.float32) * 0.05
    g, h = pallas_newton.stats(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(beta), "logistic"
    )
    g, h = np.asarray(g), np.asarray(h)
    assert np.all(g[dl:] == 0.0)
    assert np.all(h[dl:, :] == 0.0) and np.all(h[:, dl:] == 0.0)
    og, oh = _oracle("logistic", x[:, :dl], y, beta[:dl])
    assert _rel(g[:dl], og) < BF16_REL
    assert _rel(h[:dl, :dl], oh) < BF16_REL


def test_stats_nonfinite_tail_guard(app_inst):
    """Garbage beyond the logical rows must not poison the stats: the
    kernel masks r and s on pad rows (0*nan = nan on the MXU). Emulated
    here by the ragged-row shapes whose last Pallas block is padded
    with unspecified values — plus an explicit nan-free assertion."""
    from nums_tpu.core.ops import pallas_newton
    import jax.numpy as jnp

    rs = np.random.RandomState(3)
    n, d = 907, 128  # prime row count: always a ragged last block
    x = rs.randn(n, d).astype(np.float32) * 0.1
    y = (rs.rand(n) > 0.5).astype(np.float32)
    beta = rs.randn(d).astype(np.float32) * 0.05
    g, h = pallas_newton.stats(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(beta), "logistic"
    )
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.isfinite(np.asarray(h)))


def test_supported_shapes():
    from nums_tpu.core.ops import pallas_newton

    assert pallas_newton.supported((10000, 128), np.float32)
    assert not pallas_newton.supported((100,), np.float32)
    assert not pallas_newton.supported((10000, 1000), np.float32)
    assert not pallas_newton.supported((10000, 8192), np.float32)
    assert not pallas_newton.supported((10000, 128), np.float64)


def test_enabled_follows_gram_gate(app_inst, monkeypatch):
    from nums_tpu.core.ops import pallas_newton

    monkeypatch.setenv("NUMS_TPU_PALLAS_NEWTON", "auto")
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "0")
    assert not pallas_newton.enabled()
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")
    assert pallas_newton.enabled()  # auto follows the gram gate
    monkeypatch.setenv("NUMS_TPU_PALLAS_NEWTON", "0")
    assert not pallas_newton.enabled()  # own kill switch wins
    monkeypatch.setenv("NUMS_TPU_PALLAS_NEWTON", "1")
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "0")
    assert pallas_newton.enabled()  # own force wins


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(12))
def test_stats_shape_kind_fuzz(app_inst, seed):
    """Randomized (n, d, kind, scale) sweep against the float64 oracle
    — pre-hardware confidence for the shapes the OOC/GLM routes feed
    the kernel (odd n incl. sub-chunk, every 128-multiple d tier, beta
    scales spanning near-saturated links)."""
    from nums_tpu.core.ops import pallas_newton
    import jax.numpy as jnp

    rs = np.random.RandomState(1000 + seed)
    n = int(rs.choice([17, 100, 384, 1000, 1025, 4096]))
    d = int(rs.choice([128, 256, 384, 512]))
    kind = str(rs.choice(["logistic", "linear", "poisson"]))
    xscale = float(rs.choice([0.01, 0.1, 0.3]))
    bscale = float(rs.choice([0.01, 0.1]))
    x = rs.randn(n, d).astype(np.float32) * xscale
    y = (rs.rand(n) > 0.5).astype(np.float32)
    beta = rs.randn(d).astype(np.float32) * bscale
    if not pallas_newton.supported(x.shape, x.dtype):
        pytest.skip(f"plan rejects ({n}, {d})")
    g, h = pallas_newton.stats(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(beta), kind
    )
    og, oh = _oracle(kind, x, y, beta)
    assert _rel(np.asarray(g), og) < BF16_REL, (n, d, kind)
    assert _rel(np.asarray(h), oh) < BF16_REL, (n, d, kind)
    assert np.array_equal(np.asarray(h), np.asarray(h).T), (n, d, kind)
