"""Fused TPU training steps for GLMs.

The BlockArray-level GLM (``nums_tpu.models.glms``) mirrors the reference's
eager per-op structure (one dispatch per op, parity with
``nums/models/glms.py``). This module is the TPU-native fast path: the
ENTIRE solver iteration (forward, gradient, Hessian, Cholesky solve) is one
jitted program, so XLA fuses the elementwise chain into the two matmuls
and the MXU sees back-to-back GEMMs. This is the flagship "model" for
benchmarks (reference analogue: ``scripts/benchmark_lr.py:56-150``'s
one-step Newton benchmark).

Under a mesh: X is sharded (rows = data-parallel, cols = tensor-parallel);
XLA inserts the psum for X^T(mu-y) and X^T S X over ICI automatically.
"""

import functools

import jax
import jax.numpy as jnp


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _posdef_solve(a, b):
    l = jnp.linalg.cholesky(a)
    z = jax.scipy.linalg.solve_triangular(l, b, lower=True)
    return jax.scipy.linalg.solve_triangular(l.T, z, lower=False)


def logistic_newton_step(X, y, beta):
    """One Newton step of logistic regression. Fully fused.

    Matches the math of the reference benchmark step
    (scripts/benchmark_lr.py:56-150): mu = sigmoid(X beta);
    g = X^T (mu - y); H = X^T S X; beta' = beta - H^{-1} g.
    """
    mu = _sigmoid(X @ beta)
    g = X.T @ (mu - y)
    s = mu * (1.0 - mu)
    H = (X * s[:, None]).T @ X
    return beta - _posdef_solve(H, g), g


logistic_newton_step_jit = jax.jit(logistic_newton_step)


def linear_newton_step(X, y, beta):
    mu = X @ beta
    g = X.T @ (mu - y)
    H = X.T @ X
    return beta - _posdef_solve(H, g), g


def poisson_newton_step(X, y, beta):
    eta = X @ beta
    mu = jnp.exp(eta)
    g = X.T @ (mu - y)
    H = (X * mu[:, None]).T @ X
    return beta - _posdef_solve(H, g), g


_STEPS = {
    "logistic": logistic_newton_step,
    "linear": linear_newton_step,
    "poisson": poisson_newton_step,
}


@functools.partial(jax.jit, static_argnames=("kind", "num_iters"))
def newton_train(X, y, beta0, kind="logistic", num_iters=10):
    """Fixed-iteration Newton training as ONE compiled program.

    The reference's per-iteration driver sync (``ray.get`` on the
    convergence test every iteration, glms.py:370-371) disappears: the
    loop is a lax.scan on device; convergence is checked after.
    """
    step = _STEPS[kind]

    def body(beta, _):
        beta, g = step(X, y, beta)
        return beta, jnp.max(jnp.abs(g))

    beta, gmax = jax.lax.scan(body, beta0, None, length=num_iters)
    return beta, gmax


def fit_logistic(X, y, num_iters=10):
    """Convenience: train from zeros. X: (n, d) jax/np array, y: (n,)."""
    X = jnp.asarray(X)
    y = jnp.asarray(y)
    ones = jnp.ones((X.shape[0], 1), X.dtype)
    Xa = jnp.concatenate([X, ones], axis=1)
    beta0 = jnp.zeros((Xa.shape[1],), Xa.dtype)
    beta, _ = newton_train(Xa, y, beta0, kind="logistic", num_iters=num_iters)
    return beta


def predict_proba_logistic(X, beta):
    X = jnp.asarray(X)
    return _sigmoid(X @ beta[:-1] + beta[-1])
