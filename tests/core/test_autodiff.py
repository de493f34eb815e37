"""Autodiff through the BlockArray/facade API (no reference analogue —
the reference's Ray tasks are opaque to differentiation)."""

import numpy as np
import pytest

from nums_tpu import autodiff


def test_grad_elementwise_chain(app_inst):
    x_np = np.linspace(-1.0, 2.0, 12)
    x = app_inst.array(x_np, block_shape=(4,))

    def f(v):
        return ((v * v) * 3.0 + v).sum()

    g = autodiff.grad(f)(x)
    assert g.shape == x.shape and g.block_shape == x.block_shape
    assert np.allclose(g.get(), 6.0 * x_np + 1.0)


def test_value_and_grad_least_squares(app_inst):
    rs = np.random.RandomState(0)
    X_np = rs.randn(24, 5)
    y_np = rs.randn(24)
    beta_np = rs.randn(5)
    X = app_inst.array(X_np, block_shape=(8, 5))
    y = app_inst.array(y_np, block_shape=(8,))
    beta = app_inst.array(beta_np, block_shape=(5,))

    def loss(b):
        r = X @ b - y
        return (r * r).sum()

    val, g = autodiff.value_and_grad(loss)(beta)
    want_val = float(((X_np @ beta_np - y_np) ** 2).sum())
    want_g = 2.0 * X_np.T @ (X_np @ beta_np - y_np)
    assert np.isclose(float(val.get()), want_val)
    assert np.allclose(g.get(), want_g, atol=1e-8)


def test_grad_multiple_argnums(app_inst):
    rs = np.random.RandomState(1)
    a_np, b_np = rs.randn(6), rs.randn(6)
    a = app_inst.array(a_np, block_shape=(3,))
    b = app_inst.array(b_np, block_shape=(3,))

    def f(u, v):
        return (u * v).sum() + (u * u).sum()

    ga, gb = autodiff.grad(f, argnums=(0, 1))(a, b)
    assert np.allclose(ga.get(), b_np + 2 * a_np)
    assert np.allclose(gb.get(), a_np)


def test_grad_through_facade_ops(nps_app_inst):
    import nums_tpu.numpy as nps

    x_np = np.linspace(0.1, 2.0, 10)
    x = nps.array(x_np)

    def f(v):
        return nps.sum(nps.exp(v) + nps.log(v) * 0.5)

    g = autodiff.grad(f)(x)
    assert np.allclose(g.get(), np.exp(x_np) + 0.5 / x_np)


def test_grad_ragged_mesh(app_inst):
    """Pad-and-mask: gradient of a mesh-indivisible array is exact on
    the logical entries (pads carry zero cotangent)."""
    n = 13  # indivisible by the 8-device mesh
    x_np = np.linspace(-1.0, 1.0, n)
    x = app_inst.array(x_np, block_shape=(4,))
    g = autodiff.grad(lambda v: (v * v).sum())(x)
    assert np.allclose(g.get(), 2 * x_np)


def test_check_grad_utility(app_inst):
    rs = np.random.RandomState(2)
    b = app_inst.array(rs.randn(4), block_shape=(2,))
    X = app_inst.array(rs.randn(8, 4), block_shape=(4, 4))

    def f(v):
        r = X @ v
        return (r * r).sum()

    worst = autodiff.check_grad(f, (b,), atol=1e-4)
    assert worst < 1e-4


def test_grad_errors(app_inst):
    x = app_inst.array(np.arange(4.0), block_shape=(2,))
    # Non-scalar output
    with pytest.raises(AssertionError):
        autodiff.grad(lambda v: v * 2.0)(x)
    # Severed graph: output independent of the argument
    y = app_inst.array(np.arange(4.0), block_shape=(2,))
    with pytest.raises(RuntimeError, match="not reachable"):
        autodiff.grad(lambda v: (y * y).sum())(x)


def test_grad_program_cache_hits(app_inst):
    """Same structure twice → one cached grad executor."""
    from nums_tpu.core import lazy

    x = app_inst.array(np.arange(6.0) + 1.0, block_shape=(3,))
    f = autodiff.grad(lambda v: (v * v).sum())
    before = len(lazy._compiled)
    g1 = f(x).get()
    n_after_first = len(lazy._compiled)
    g2 = f(x).get()
    assert np.allclose(g1, g2)
    assert len(lazy._compiled) == n_after_first
    assert n_after_first >= before


def test_grad_rejects_interior_materialization(app_inst):
    """A host sync on an INTERMEDIATE inside f must raise, not silently
    treat the synced subexpression as a constant."""
    x_np = np.arange(1.0, 5.0)
    x = app_inst.array(x_np, block_shape=(2,))

    def f(v):
        a = (v * v).sum()
        float(a.get())  # sync severs a's subtree
        return a + v.sum()

    with pytest.raises(RuntimeError, match="INSIDE the traced function"):
        autodiff.grad(f)(x)


def test_purity_guard_is_thread_scoped(app_inst):
    """A concurrent thread materializing UNRELATED arrays during a
    traced call must not false-positive the purity guard (the
    materialize counter is thread-local)."""
    import threading

    x_np = np.arange(1.0, 9.0)
    x = app_inst.array(x_np, block_shape=(4,))
    release = threading.Event()
    side_done = threading.Event()
    errors = []

    def side_thread():
        try:
            release.wait(timeout=30)
            y = app_inst.array(np.arange(16.0), block_shape=(8,))
            for _ in range(3):
                y = y * 2.0
                y.get()  # materializes on the side thread
        except Exception as e:  # pragma: no cover
            errors.append(e)
        finally:
            side_done.set()

    t = threading.Thread(target=side_thread, daemon=True)
    t.start()

    def f(v):
        release.set()
        assert side_done.wait(timeout=30)
        return (v * v).sum()

    g = autodiff.grad(f)(x)
    t.join(timeout=30)
    assert not errors
    assert np.allclose(g.get(), 2.0 * x_np)


def test_hvp_reblocks_mismatched_tangent(app_inst):
    rs = np.random.RandomState(4)
    A_np = rs.randn(4, 4)
    A = app_inst.array(A_np, block_shape=(4, 4))
    x = app_inst.array(rs.randn(4), block_shape=(2,))
    v_np = rs.randn(4)
    v = app_inst.array(v_np, block_shape=(4,))  # different blocking

    def f(u):
        return (u @ (A @ u)).sum()

    got = autodiff.hvp(f)(x, v).get()
    assert np.allclose(got, (A_np + A_np.T) @ v_np, atol=1e-6)


def test_autodiff_fuzz_random_chains(app_inst):
    """Random differentiable op chains vs central finite differences —
    the autodiff analogue of the op-sequence fuzzer."""
    rs = np.random.RandomState(7)
    for trial in range(6):
        n, d = 8, 3
        X_np = rs.randn(n, d)
        X = app_inst.array(X_np, block_shape=(4, d))
        w_np = rs.randn(d) * 0.5
        w = app_inst.array(w_np, block_shape=(d,))
        ops = rs.choice(5, size=4)

        def f(v, _ops=tuple(ops)):
            t = X @ v
            for o in _ops:
                if o == 0:
                    t = t * t * 0.5
                elif o == 1:
                    t = abs(t) + 0.1
                elif o == 2:
                    t = t + (X @ v) * 0.3
                elif o == 3:
                    t = t * 0.7 - 1.0
                else:
                    t = t / 2.0 + t * t * 0.1
            return (t * t).sum()

        worst = autodiff.check_grad(f, (w,), atol=5e-3, eps=1e-5)
        assert worst < 5e-3, (trial, ops, worst)
