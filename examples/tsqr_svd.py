"""Distributed tall-skinny QR / SVD demo (north-star linalg path)."""

import numpy as np

import nums_tpu


def main():
    app = nums_tpu.init()
    rs = app.random_state(0)
    m, n = 1 << 18, 64
    X = rs.normal(shape=(m, n), block_shape=(m // 8, n))

    Q, R = app.direct_tsqr(X)
    err = float(app.max(app.abs(Q @ R - X))) / float(app.max(app.abs(X)))
    print(f"TSQR {m}x{n}: max rel |QR - X| = {err:.2e}")

    U, S, VT = app.svd(X)
    top = S.get()[:4]
    print("top singular values:", np.round(top, 2))

    theta = app.linear_regression(X, X @ rs.normal(shape=(n,), block_shape=(n,)))
    print("lstsq solved, theta shape:", theta.shape)


if __name__ == "__main__":
    main()
