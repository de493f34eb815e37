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
    """GLM training: with a lane-padded at-rest X, the fused Newton
    Hessian dispatches the symmetric Pallas kernel on the PHYSICAL
    buffer (pads stay zero through every iteration; the solve gives
    pad rows a unit diagonal) and the fit still converges."""
    monkeypatch.setenv("NUMS_TPU_PALLAS_GRAM", "1")
    from nums_tpu.core.ops import pallas_gram
    from nums_tpu.models.glms import LogisticRegression

    rs = np.random.RandomState(3)
    n, d = 2048, 96
    X = rs.randn(n, d).astype(np.float32)
    w = rs.randn(d).astype(np.float32)
    y = (X @ w + 0.1 * rs.randn(n).astype(np.float32) > 0).astype(
        np.float32
    )

    calls = []
    orig = pallas_gram.gram_fn
    monkeypatch.setattr(
        pallas_gram, "gram_fn", lambda *a: calls.append(a) or orig(*a)
    )
    bx = padded_app.array(X, block_shape=(n, d))
    by = padded_app.array(y, block_shape=(n,))
    model = LogisticRegression(solver="newton", tol=1e-6, max_iter=10)
    model.fit(bx, by)
    acc = float((model.predict(bx).get() == y).mean())
    assert acc > 0.97, acc
    assert any(a[-1] == 128 for a in calls), calls  # physical width


def test_checkpoint_roundtrip_padded(padded_app, tmp_path):
    rs = np.random.RandomState(2)
    x = rs.randn(24, 17)
    bx = padded_app.array(x, block_shape=(6, 17))
    padded_app.write_fs(bx, str(tmp_path / "arr"))
    back = padded_app.read_fs(str(tmp_path / "arr"))
    assert back.shape == (24, 17)
    assert np.allclose(back.get(), x)
