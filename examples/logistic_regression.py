"""Canonical end-to-end demo (parity: reference examples/logistic_regression.py).

Synthetic two-class data, logistic regression via Newton's method.
"""

import nums_tpu
from nums_tpu.models.glms import LogisticRegression


def main():
    app = nums_tpu.init()
    print("backend:", app.backend.name)

    rs = app.random_state(1337)
    n, d = 1000, 10
    X1 = rs.normal(loc=5.0, shape=(n // 2, d), block_shape=(n // 2, d))
    y1 = app.zeros((n // 2,), (n // 2,), dtype=float)
    X2 = rs.normal(loc=10.0, shape=(n // 2, d), block_shape=(n // 2, d))
    y2 = app.ones((n // 2,), (n // 2,), dtype=float)
    X = app.concatenate([X1, X2], axis=0)
    y = app.concatenate([y1, y2], axis=0)

    model = LogisticRegression(solver="newton-cg", tol=1e-8, max_iter=10)
    model.fit(X, y)
    y_pred = model.predict(X)
    acc = (y.astype(int) == y_pred).mean()
    print("accuracy:", float(acc))
    assert float(acc) > 0.95


if __name__ == "__main__":
    main()
