"""Differentiate and optimize ARBITRARY objectives written against the
distributed array API — capabilities with no reference analogue.

Demo: robust (Huber) regression with an l2 ridge term — a model nobody
hand-fused — trained by `optimize.minimize`; the whole objective +
gradient compile as one cached XLA program per step.
"""

import numpy as np

import nums_tpu
import nums_tpu.numpy as nps
from nums_tpu import autodiff, optimize


def main():
    app = nums_tpu.init()
    rs = np.random.RandomState(0)
    n, d = 20_000, 16
    X_np = rs.randn(n, d)
    theta = np.linspace(-2.0, 2.0, d)
    y_np = X_np @ theta + 0.1 * rs.randn(n)
    # 2% gross outliers — least squares would chase them, Huber won't.
    out_idx = rs.choice(n, n // 50, replace=False)
    y_np[out_idx] += rs.randn(len(out_idx)) * 50.0

    X = app.array(X_np, block_shape=(5_000, d))
    y = app.array(y_np, block_shape=(5_000,))
    delta, lam = 1.0, 1e-3

    def huber_ridge(beta):
        r = X @ beta - y
        a = abs(r)
        quad = 0.5 * r * r
        lin = delta * (a - 0.5 * delta)
        loss = nps.where(a <= delta, quad, lin).sum() * (1.0 / n)
        return loss + lam * (beta * beta).sum()

    b0 = app.array(np.zeros(d), block_shape=(d,))
    res = optimize.minimize(huber_ridge, b0, method="adam",
                            learning_rate=0.05, steps=400, tol=1e-5)
    err = np.abs(res.x.get() - theta).max()
    print(f"huber ridge: {res.n_iter} iters, loss={res.fun:.5f}, "
          f"max|beta - theta|={err:.4f} (outlier-robust)")

    ls = np.linalg.lstsq(X_np, y_np, rcond=None)[0]
    print(f"least squares (outlier-corrupted) max err: "
          f"{np.abs(ls - theta).max():.4f}")

    # Curvature probe via Hessian-vector products (no explicit Hessian).
    v = app.array(np.eye(d)[0], block_shape=(d,))
    hv = autodiff.hvp(huber_ridge)(res.x, v)
    print("H @ e0 head:", np.round(hv.get()[:3], 4))


if __name__ == "__main__":
    main()
