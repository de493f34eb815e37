"""Generic optimizer over BlockArray objectives (autodiff + optax)."""

import numpy as np
import pytest

from nums_tpu import autodiff, optimize


def test_minimize_quadratic_converges(app_inst):
    rs = np.random.RandomState(0)
    target = rs.randn(6)
    t = app_inst.array(target, block_shape=(3,))
    x0 = app_inst.array(np.zeros(6), block_shape=(3,))

    def f(x):
        d = x - t
        return (d * d).sum()

    res = optimize.minimize(f, x0, method="momentum", learning_rate=0.1,
                            steps=500, tol=1e-8)
    assert res.converged
    assert np.allclose(res.x.get(), target, atol=1e-4)
    assert res.fun < 1e-8


def test_minimize_least_squares_matches_closed_form(app_inst):
    rs = np.random.RandomState(1)
    X_np = rs.randn(60, 4)
    y_np = X_np @ np.array([1.0, -2.0, 0.5, 3.0]) + 0.01 * rs.randn(60)
    X = app_inst.array(X_np, block_shape=(20, 4))
    y = app_inst.array(y_np, block_shape=(20,))
    b0 = app_inst.array(np.zeros(4), block_shape=(4,))

    def loss(b):
        r = X @ b - y
        return (r * r).sum() * (1.0 / 60.0)

    seen = []
    res = optimize.minimize(
        loss, b0, method="adam", learning_rate=0.2, steps=800, tol=1e-7,
        callback=lambda it, v, g: seen.append(v),
    )
    want = np.linalg.lstsq(X_np, y_np, rcond=None)[0]
    assert np.allclose(res.x.get(), want, atol=1e-3), res.x.get()
    assert len(seen) > 3
    assert seen[-1] < seen[0] * 1e-3  # loss actually decreased


def test_minimize_unknown_method(app_inst):
    x0 = app_inst.array(np.zeros(2), block_shape=(2,))
    with pytest.raises(ValueError, match="unknown method"):
        optimize.minimize(lambda v: (v * v).sum(), x0, method="nope")


def test_hvp_quadratic(app_inst):
    """H·v for f = x'Ax is (A + A')v."""
    rs = np.random.RandomState(2)
    A_np = rs.randn(5, 5)
    A = app_inst.array(A_np, block_shape=(5, 5))
    x = app_inst.array(rs.randn(5), block_shape=(5,))
    v_np = rs.randn(5)
    v = app_inst.array(v_np, block_shape=(5,))

    def f(u):
        return (u @ (A @ u)).sum()

    got = autodiff.hvp(f)(x, v).get()
    assert np.allclose(got, (A_np + A_np.T) @ v_np, atol=1e-6)


def test_minimize_fused_matches_eager(app_inst):
    rs = np.random.RandomState(3)
    X_np = rs.randn(40, 3)
    y_np = X_np @ np.array([2.0, -1.0, 0.5])
    X = app_inst.array(X_np, block_shape=(20, 3))
    y = app_inst.array(y_np, block_shape=(20,))
    b0 = app_inst.array(np.zeros(3), block_shape=(3,))

    def loss(b):
        r = X @ b - y
        return (r * r).sum() * (1.0 / 40.0)

    kw = dict(method="momentum", learning_rate=0.2, steps=300, tol=1e-9)
    eager = optimize.minimize(loss, b0, **kw)
    fused = optimize.minimize(loss, b0, fused=True, **kw)
    assert fused.converged == eager.converged
    assert np.allclose(fused.x.get(), eager.x.get(), atol=1e-6)
    assert abs(fused.fun - eager.fun) < 1e-8
    # Second fused call hits the cached whole-loop program.
    fused2 = optimize.minimize(loss, b0, fused=True, **kw)
    assert np.allclose(fused2.x.get(), fused.x.get())


@pytest.mark.parametrize("fused", [False, True])
def test_minimize_multi_parameter(app_inst, fused):
    """Tuple-of-parameters objective (W, b) — a tiny linear model with
    separate weight and bias arrays."""
    rs = np.random.RandomState(4)
    X_np = rs.randn(50, 3)
    w_true = np.array([1.0, -0.5, 2.0])
    b_true = 0.7
    y_np = X_np @ w_true + b_true
    X = app_inst.array(X_np, block_shape=(25, 3))
    y = app_inst.array(y_np, block_shape=(25,))
    w0 = app_inst.array(np.zeros(3), block_shape=(3,))
    b0 = app_inst.array(np.zeros(1), block_shape=(1,))

    def loss(w, b):
        r = X @ w + b.sum() - y
        return (r * r).sum() * (1.0 / 50.0)

    res = optimize.minimize(
        loss, (w0, b0), method="adam", learning_rate=0.1, steps=1200,
        tol=1e-8, fused=fused,
    )
    w_fit, b_fit = res.x
    assert np.allclose(w_fit.get(), w_true, atol=1e-3)
    assert np.isclose(float(b_fit.get()[0]), b_true, atol=1e-3)
    assert res.fun < 1e-6


@pytest.mark.parametrize("fused", [False, True])
def test_minimize_mixed_dtype_params(app_inst, fused):
    """float32 weights + float64 bias (np.zeros default) must work on
    both paths — review finding: the fused carry pinned gmax to the
    first param's dtype."""
    rs = np.random.RandomState(5)
    X_np = rs.randn(30, 2).astype(np.float32)
    y_np = (X_np @ np.array([1.0, -1.0], np.float32)) + 0.3
    X = app_inst.array(X_np, block_shape=(15, 2))
    y = app_inst.array(y_np, block_shape=(15,))
    w0 = app_inst.array(np.zeros(2, np.float32), block_shape=(2,))
    b0 = app_inst.array(np.zeros(1), block_shape=(1,))  # float64 default

    def loss(w, b):
        r = X @ w + b.sum() - y
        return (r * r).sum()

    res = optimize.minimize(loss, (w0, b0), method="momentum",
                            learning_rate=0.01, steps=400, tol=1e-6,
                            fused=fused)
    w_fit, b_fit = res.x
    assert np.allclose(w_fit.get(), [1.0, -1.0], atol=1e-2)
    assert np.isclose(float(b_fit.get()[0]), 0.3, atol=1e-2)


@pytest.mark.parametrize("fused", [False, True])
def test_minimize_rejects_shared_buffers(app_inst, fused):
    x = app_inst.array(np.ones(3), block_shape=(3,))
    with pytest.raises(ValueError, match="share the same underlying"):
        optimize.minimize(
            lambda a, b: (a * b).sum(), (x, x), fused=fused, steps=2
        )
