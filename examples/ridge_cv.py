"""Ridge regression with k-fold cross-validation over blocks
(the reference's CV-from-block-assignment pattern, distributed linalg path)."""

import numpy as np

import nums_tpu


def main():
    app = nums_tpu.init()
    rs = app.random_state(7)
    n, d, folds = 4096, 32, 4
    theta_true = rs.normal(shape=(d,), block_shape=(d,))
    X = rs.normal(shape=(n, d), block_shape=(n // folds, d))
    noise = rs.normal(scale=0.1, shape=(n,), block_shape=(n // folds,))
    y = X @ theta_true + noise

    fold_rows = n // folds
    for lamb in (1e-6, 1.0, 100.0):
        errs = []
        for f in range(folds):
            lo, hi = f * fold_rows, (f + 1) * fold_rows
            train_idx = np.concatenate(
                [np.arange(0, lo), np.arange(hi, n)]
            )
            theta = app.ridge_regression(X[train_idx], y[train_idx], lamb)
            resid = X[lo:hi] @ theta - y[lo:hi]
            errs.append(float((resid * resid).mean()))
        print(f"lambda={lamb:g}: cv mse = {np.mean(errs):.5f}")


if __name__ == "__main__":
    main()
