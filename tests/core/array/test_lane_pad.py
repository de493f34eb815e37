"""At-rest lane padding (NUMS_TPU_LANE_PAD, round 4).

The serial backend optionally pads the minor dim of >=2-D arrays to the
TPU lane multiple (128) at rest, zero-filled — the same pad-and-mask
invariant as mesh ragged padding, applied so lane-aligned kernels (the
symmetric Pallas gram) consume buffers with no relayout copy. The full
suite runs with this OFF; these tests flip it on explicitly (the CI
slow tier and bench.py run with it on)."""

import numpy as np
import pytest

from nums_tpu.core import application_manager, settings


@pytest.fixture()
def padded_app(monkeypatch):
    monkeypatch.setattr(settings, "lane_pad", True)
    monkeypatch.setattr(settings, "lane_pad_min", 8)
    monkeypatch.setattr(settings, "backend_name", "serial")
    application_manager.destroy()
    app = application_manager.create()
    yield app
    application_manager.destroy()
    application_manager.create()


def test_creation_pads_minor_dim_with_zeros(padded_app):
    x = np.arange(72.0).reshape(8, 9)
    bx = padded_app.array(x, block_shape=(4, 9))
    assert tuple(bx.raw.shape) == (8, 128)  # at-rest lane padded
    assert bx.shape == (8, 9)
    raw = np.asarray(bx.raw)
    assert np.array_equal(raw[:, :9], x)
    assert np.all(raw[:, 9:] == 0)  # zero-filled pads
    assert np.array_equal(bx.get(), x)


def test_ops_on_padded_buffers_match_oracle(padded_app):
    rs = np.random.RandomState(0)
    x = rs.randn(16, 10)
    y = rs.randn(16, 10)
    bx = padded_app.array(x, block_shape=(8, 10))
    by = padded_app.array(y, block_shape=(8, 10))
    assert np.allclose((bx + by).get(), x + y)
    # Scalar broadcast must NOT leak into the pads' bookkeeping.
    b1 = bx + 1.0
    assert b1.shape == (16, 10)
    assert np.allclose(b1.get(), x + 1.0)
    assert np.allclose((bx @ by.T).get(), x @ y.T)
    assert np.allclose(bx.sum(axis=0).get(), x.sum(axis=0))
    assert np.allclose(bx.T.get(), x.T)
    assert bool(padded_app.allclose(bx, padded_app.array(
        x + 1e-12, block_shape=(8, 10))))


def test_pallas_gram_fast_path_on_padded_buffer(padded_app, monkeypatch):
    """The point of lane padding: x.T @ x dispatches the symmetric
    Pallas kernel on the PHYSICAL buffer (zero pads contribute zero),
    and the result's at-rest pads are exactly zero."""
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")
    from nums_tpu.core.ops import pallas_gram

    rs = np.random.RandomState(1)
    x = rs.randn(4096, 100).astype(np.float32)  # pads to (4096, 128)
    bx = padded_app.array(x, block_shape=(1024, 100))
    assert pallas_gram.supported(tuple(bx.raw.shape), bx.dtype)
    calls = []
    orig = pallas_gram.gram_fn
    monkeypatch.setattr(
        pallas_gram, "gram_fn",
        lambda *a: calls.append(a) or orig(*a),
    )
    g = bx.T @ bx
    assert calls == [(4096, 128)]  # kernel took the PHYSICAL shape
    host = g.get()
    assert host.shape == (100, 100)
    rel = np.abs(host - x.T @ x).max() / np.abs(x.T @ x).max()
    assert rel < 2e-3  # bf16-MAC class
    raw = np.asarray(g.raw)
    assert raw.shape == (128, 128)
    assert np.all(raw[100:, :] == 0) and np.all(raw[:, 100:] == 0)


def test_fused_newton_rides_pallas_on_padded_buffer(padded_app, monkeypatch):
    """GLM training: with a lane-padded at-rest X, the Newton stats
    dispatch the fused one-pass kernel on the PHYSICAL buffer (pads
    stay zero through every iteration; the solve gives pad rows a unit
    diagonal) and the fit still converges."""
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")
    from nums_tpu.core.ops import pallas_newton
    from nums_tpu.models.glms import LogisticRegression

    rs = np.random.RandomState(3)
    n, d = 2048, 96
    X = rs.randn(n, d).astype(np.float32)
    w = rs.randn(d).astype(np.float32)
    y = (X @ w + 0.1 * rs.randn(n).astype(np.float32) > 0).astype(
        np.float32
    )

    calls = []
    orig = pallas_newton.stats_fn
    monkeypatch.setattr(
        pallas_newton, "stats_fn",
        lambda *a, **k: calls.append((a, k)) or orig(*a, **k),
    )
    bx = padded_app.array(X, block_shape=(n, d))
    by = padded_app.array(y, block_shape=(n,))
    model = LogisticRegression(solver="newton", tol=1e-6, max_iter=10)
    model.fit(bx, by)
    acc = float((model.predict(bx).get() == y).mean())
    assert acc > 0.97, acc
    # Physical (padded) width, logistic link — eta/g/H in ONE kernel
    # pass (supersedes the round-4 gram-with-fused-scale route).
    assert any(a[1] == 128 and a[2] == "logistic" for a, _ in calls), calls


def test_gram_ooc_rides_pallas_lane_padded(padded_app, monkeypatch,
                                           tmp_path):
    """The library OOC path: gram_ooc transfers panels zero-padded to
    the 128 multiple and the streaming update dispatches the symmetric
    kernel per shape (falls back to XLA for panels too short to
    stream, identically-valued either way)."""
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")
    from nums_tpu.core.ops import pallas_gram, streaming

    rs = np.random.RandomState(5)
    n, d = 3100, 96  # ragged: 3100 rows over 1024-row panels
    real_X = rs.randn(n, d).astype(np.float32)
    X = padded_app.array(real_X, block_shape=(1024, d))
    dX = padded_app.spill(X, str(tmp_path / "Xooc"))

    calls = []
    orig = pallas_gram.gram_fn
    monkeypatch.setattr(
        pallas_gram, "gram_fn", lambda *a: calls.append(a) or orig(*a)
    )
    streaming.gram_update.cache_clear()  # retrace under the counter
    G = padded_app.gram_ooc(dX, dtype=np.float32).get()
    assert G.shape == (d, d)
    rel = np.abs(G - real_X.T @ real_X).max() / np.abs(
        real_X.T @ real_X
    ).max()
    assert rel < 2e-3, rel  # bf16-MAC class
    # Full panels (1024 rows) took the kernel at the PADDED width; the
    # 28-row ragged tail legitimately falls back to XLA.
    assert (1024, 128) in calls, calls


def test_pca_and_linreg_ooc_lane_padded(padded_app, monkeypatch,
                                        tmp_path):
    """The other streamed gram consumers (PCA moments, linear normal
    equations) under the lane-padded route: padded accumulators slice
    back to the logical corner and match in-core oracles."""
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")
    rs = np.random.RandomState(11)
    n, d = 3100, 96
    real_X = rs.randn(n, d).astype(np.float32)
    real_y = (real_X @ np.linspace(-1, 1, d) + 0.05 * rs.randn(n)).astype(
        np.float32
    )
    X = padded_app.array(real_X, block_shape=(1024, d))
    dX = padded_app.spill(X, str(tmp_path / "Xpca"))

    theta = padded_app.linear_regression_ooc(
        dX, real_y, lamb=1e-3
    ).get()
    G64 = real_X.T.astype(np.float64) @ real_X.astype(np.float64)
    oracle = np.linalg.solve(
        G64 + 1e-3 * np.eye(d), real_X.T.astype(np.float64) @ real_y
    )
    rel = np.abs(theta - oracle).max() / np.abs(oracle).max()
    assert rel < 5e-2, rel  # bf16-MAC class through the solve

    from nums_tpu.models.decomposition import PCA

    pca = PCA(n_components=3)
    pca.fit(dX)
    # Column spaces agree with the in-core fit (signs fixed by the
    # deterministic convention; bf16 gram → loose tolerance).
    pca_ic = PCA(n_components=3)
    pca_ic.fit(X)
    comp_ooc = np.asarray(pca.components_.get())
    comp_ic = np.asarray(pca_ic.components_.get())
    assert np.allclose(np.abs(comp_ooc), np.abs(comp_ic), atol=5e-2)


def test_newton_fit_ooc_rides_pallas(padded_app, monkeypatch, tmp_path):
    """OOC GLM training: panels arrive intercept-augmented and
    lane-padded from ooc_put, the streaming Hessian rides the
    symmetric kernel, and the fit converges to the in-core beta."""
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")
    import jax.numpy as jnp

    from nums_tpu.core.ops import pallas_newton, streaming
    from nums_tpu.models import fast_glm

    rs = np.random.RandomState(7)
    n, d = 3100, 96  # da=97 -> padded to 128
    real_X = rs.randn(n, d).astype(np.float32)
    w = rs.randn(d).astype(np.float32) * 0.5
    y = (real_X @ w > 0).astype(np.float32)
    X = padded_app.array(real_X, block_shape=(1024, d))
    dX = padded_app.spill(X, str(tmp_path / "Xglm"))

    calls = []
    orig = pallas_newton.stats_fn
    monkeypatch.setattr(
        pallas_newton, "stats_fn",
        lambda *a, **k: calls.append((a, k)) or orig(*a, **k),
    )
    streaming.glm_stats_update_aug.cache_clear()
    beta_ooc, gmax, _ = fast_glm.newton_fit_ooc(
        dX, y, tol=1e-4, kind="logistic", max_iter=8
    )
    assert beta_ooc.shape == (d + 1,)
    # Padded augmented panels: eta/g/H fused into ONE kernel pass per
    # panel (supersedes the round-4 gram-with-fused-scale route).
    assert any(a == (1024, 128, "logistic") for a, _ in calls), calls

    Xa = jnp.concatenate(
        [jnp.asarray(real_X), jnp.ones((n, 1), jnp.float32)], axis=1
    )
    beta_ic, _, _ = fast_glm.newton_fit(
        Xa, jnp.asarray(y), jnp.zeros((d + 1,), jnp.float32), 1e-4,
        kind="logistic", max_iter=8,
    )
    denom = max(1e-6, float(np.abs(np.asarray(beta_ic)).max()))
    rel = float(
        np.abs(np.asarray(beta_ooc) - np.asarray(beta_ic)).max()
    ) / denom
    assert rel < 5e-2, rel

    # linear kind: Newton converges in ONE step to the least-squares
    # solution of the intercept-augmented system — an exact oracle.
    y_lin = (real_X @ w + 0.3).astype(np.float32)
    beta_lin, _, _ = fast_glm.newton_fit_ooc(
        dX, y_lin, tol=0.0, kind="linear", max_iter=1
    )
    Xa_np = np.concatenate(
        [real_X, np.ones((n, 1), np.float32)], axis=1
    ).astype(np.float64)
    oracle = np.linalg.lstsq(Xa_np, y_lin.astype(np.float64),
                             rcond=None)[0]
    rel = np.abs(np.asarray(beta_lin) - oracle).max() / np.abs(
        oracle
    ).max()
    assert rel < 5e-2, rel  # bf16-MAC Hessian class


def test_checkpoint_roundtrip_padded(padded_app, tmp_path):
    rs = np.random.RandomState(2)
    x = rs.randn(24, 17)
    bx = padded_app.array(x, block_shape=(6, 17))
    padded_app.write_fs(bx, str(tmp_path / "arr"))
    back = padded_app.read_fs(str(tmp_path / "arr"))
    assert back.shape == (24, 17)
    assert np.allclose(back.get(), x)
