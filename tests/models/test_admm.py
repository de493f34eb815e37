"""ADMM solver tests — the solver the reference stubs out
(glms.py:397-398 there), plus the l1 (lasso) penalty it enables."""

import numpy as np
import pytest

from nums_tpu.core.io.datasets import BimodalGaussian


def test_linear_admm_matches_newton(nps_app_inst):
    from nums_tpu.models.glms import LinearRegression

    rs = np.random.RandomState(0)
    real_X = rs.randn(500, 8)
    real_theta = rs.randn(8)
    real_y = real_X @ real_theta + 0.01 * rs.randn(500)
    X = nps_app_inst.array(real_X, block_shape=(100, 8))
    y = nps_app_inst.array(real_y, block_shape=(100,))

    ref = LinearRegression(solver="newton", tol=1e-8, max_iter=10)
    ref.fit(X, y)
    model = LinearRegression(solver="admm", tol=1e-6, max_iter=500)
    model.fit(X, y)
    assert np.allclose(
        model._beta.get(), ref._beta.get(), atol=1e-3
    ), (model._beta.get(), ref._beta.get())
    # R^2 near 1 on near-noiseless data.
    assert model.score(X, y) > 0.999


def test_linear_lasso_recovers_sparsity(nps_app_inst):
    from nums_tpu.models.glms import LinearRegression

    rs = np.random.RandomState(1)
    n, d = 600, 12
    real_X = rs.randn(n, d)
    theta = np.zeros(d)
    theta[[0, 3, 7]] = [3.0, -2.0, 1.5]
    real_y = real_X @ theta + 0.01 * rs.randn(n)
    X = nps_app_inst.array(real_X, block_shape=(150, d))
    y = nps_app_inst.array(real_y, block_shape=(150,))

    model = LinearRegression(
        solver="admm", penalty="l1", C=1.0 / 30.0, tol=1e-6, max_iter=500
    )
    model.fit(X, y)
    beta = model._beta.get()
    # The proximal iterate is exactly sparse: true-zero coords are zero.
    zero_idx = [i for i in range(d) if theta[i] == 0.0]
    assert np.max(np.abs(beta[zero_idx])) == 0.0, beta
    # Active coordinates keep sign and approximate magnitude
    # (shrunk toward zero by λ/n as lasso does).
    for i, v in [(0, 3.0), (3, -2.0), (7, 1.5)]:
        assert np.sign(beta[i]) == np.sign(v)
        assert abs(beta[i] - v) < 0.35, (i, beta[i], v)


def test_logistic_admm(nps_app_inst):
    from nums_tpu.models.glms import LogisticRegression

    real_X, real_y = BimodalGaussian.get_dataset(800, 10)
    X = nps_app_inst.array(real_X, block_shape=(200, 5))
    y = nps_app_inst.array(real_y, block_shape=(200,))

    model = LogisticRegression(solver="admm", tol=1e-5, max_iter=200)
    model.fit(X, y)
    y_pred = model.predict(X).get()
    acc = np.mean(y_pred == real_y)
    assert acc > 0.95, acc
    # Unpenalized ADMM reaches (nearly) the same NLL as Newton. On this
    # well-separated dataset the MLE is poorly identified (coefficients
    # drift large), so compare objectives, not raw coefficients.
    ref = LogisticRegression(solver="newton", tol=1e-8, max_iter=20)
    ref.fit(X, y)
    obj_admm = float(model.objective(X, y).get())
    obj_ref = float(ref.objective(X, y).get())
    assert obj_admm <= obj_ref + 0.05  # total NLL over 800 samples

    # With l2 the objective is strongly convex (unique optimum): ADMM and
    # Newton coefficients match tightly.
    m2 = LogisticRegression(
        solver="admm", penalty="l2", C=1.0, tol=1e-7, max_iter=500
    )
    m2.fit(X, y)
    r2 = LogisticRegression(
        solver="newton", penalty="l2", C=1.0, tol=1e-10, max_iter=30
    )
    r2.fit(X, y)
    assert np.allclose(m2._beta.get(), r2._beta.get(), atol=2e-3), (
        m2._beta.get(), r2._beta.get()
    )


def test_sparse_logistic_l1(nps_app_inst):
    from nums_tpu.models.glms import LogisticRegression

    rs = np.random.RandomState(2)
    n, d = 800, 10
    real_X = rs.randn(n, d)
    theta = np.zeros(d)
    theta[[1, 4]] = [2.5, -2.0]
    p = 1.0 / (1.0 + np.exp(-(real_X @ theta)))
    real_y = (rs.rand(n) < p).astype(np.float64)
    X = nps_app_inst.array(real_X, block_shape=(200, 5))
    y = nps_app_inst.array(real_y, block_shape=(200,))

    model = LogisticRegression(
        solver="admm", penalty="l1", C=1.0 / 20.0, tol=1e-5, max_iter=300
    )
    model.fit(X, y)
    beta = model._beta.get()
    active = {i for i in range(d) if abs(beta[i]) > 1e-8}
    assert {1, 4} <= active
    # Most irrelevant coordinates are EXACTLY zeroed by the prox.
    zeroed = sum(
        1 for i in range(d) if theta[i] == 0.0 and beta[i] == 0.0
    )
    assert zeroed >= 6, beta


def test_poisson_admm(nps_app_inst):
    from nums_tpu.models.glms import PoissonRegression

    rs = np.random.RandomState(3)
    n, d = 500, 5
    real_X = rs.randn(n, d) * 0.3
    theta = rs.randn(d) * 0.5
    lam = np.exp(real_X @ theta)
    real_y = rs.poisson(lam).astype(np.float64)
    X = nps_app_inst.array(real_X, block_shape=(125, d))
    y = nps_app_inst.array(real_y, block_shape=(125,))

    model = PoissonRegression(solver="admm", tol=1e-5, max_iter=100)
    model.fit(X, y)
    ref = PoissonRegression(solver="newton", tol=1e-8, max_iter=20)
    ref.fit(X, y)
    assert np.allclose(model._beta.get(), ref._beta.get(), atol=5e-2)


def test_l1_requires_admm(nps_app_inst):
    from nums_tpu.models.glms import LogisticRegression

    with pytest.raises(NotImplementedError):
        LogisticRegression(solver="newton", penalty="l1")


def test_eager_admm_entry_points_to_fused(nps_app_inst):
    from nums_tpu.models import glms

    with pytest.raises(NotImplementedError):
        glms.admm()


def test_elasticnet(nps_app_inst):
    from nums_tpu.models.glms import LinearRegression

    rs = np.random.RandomState(4)
    n, d = 600, 10
    real_X = rs.randn(n, d)
    theta = np.zeros(d)
    theta[[0, 4]] = [3.0, -2.0]
    real_y = real_X @ theta + 0.01 * rs.randn(n)
    X = nps_app_inst.array(real_X, block_shape=(150, d))
    y = nps_app_inst.array(real_y, block_shape=(150,))

    model = LinearRegression(
        solver="admm", penalty="elasticnet", C=1.0 / 30.0, l1_ratio=0.9,
        tol=1e-7, max_iter=500,
    )
    model.fit(X, y)
    beta = model._beta.get()
    # l1 component zeroes irrelevant coords; l2 component shrinks.
    zero_idx = [i for i in range(d) if theta[i] == 0.0]
    assert np.max(np.abs(beta[zero_idx])) == 0.0, beta
    assert np.sign(beta[0]) > 0 and np.sign(beta[4]) < 0
    # Oracle for the prox itself: with l1_ratio=1 elasticnet == l1.
    m_l1 = LinearRegression(
        solver="admm", penalty="l1", C=1.0 / 30.0, tol=1e-7, max_iter=500
    )
    m_l1.fit(X, y)
    m_en1 = LinearRegression(
        solver="admm", penalty="elasticnet", C=1.0 / 30.0, l1_ratio=1.0,
        tol=1e-7, max_iter=500,
    )
    m_en1.fit(X, y)
    assert np.allclose(m_en1._beta.get(), m_l1._beta.get(), atol=1e-5)


def test_elasticnet_requires_admm(nps_app_inst):
    from nums_tpu.models.glms import LinearRegression

    with pytest.raises(NotImplementedError):
        LinearRegression(solver="newton", penalty="elasticnet")


def test_sklearn_aliases(nps_app_inst):
    from nums_tpu.models.glms import Ridge, Lasso, ElasticNet

    rs = np.random.RandomState(5)
    n, d = 400, 8
    real_X = rs.randn(n, d)
    theta = np.zeros(d)
    theta[[2, 6]] = [2.0, -1.0]
    real_y = real_X @ theta + 0.01 * rs.randn(n)
    X = nps_app_inst.array(real_X, block_shape=(100, d))
    y = nps_app_inst.array(real_y, block_shape=(100,))

    r = Ridge(alpha=1.0, tol=1e-8, max_iter=10).fit(X, y)
    assert r.score(X, y) > 0.99

    la = Lasso(alpha=20.0, tol=1e-6, max_iter=500).fit(X, y)
    beta = la._beta.get()
    assert np.max(np.abs(beta[[0, 1, 3, 4, 5, 7]])) == 0.0

    en = ElasticNet(alpha=20.0, l1_ratio=1.0, tol=1e-6, max_iter=500).fit(
        X, y
    )
    assert np.allclose(en._beta.get(), beta, atol=1e-5)


def test_alias_save_load_roundtrip(nps_app_inst, tmp_path):
    import os

    from nums_tpu.models.glms import GLM, Lasso

    rs = np.random.RandomState(6)
    real_X = rs.randn(200, 5)
    real_y = real_X @ np.array([1.0, 0, 0, -2.0, 0]) + 0.01 * rs.randn(200)
    X = nps_app_inst.array(real_X, block_shape=(50, 5))
    y = nps_app_inst.array(real_y, block_shape=(50,))
    model = Lasso(alpha=5.0, tol=1e-6, max_iter=300).fit(X, y)
    path = os.path.join(tmp_path, "lasso_model")
    model.save(path)
    loaded = GLM.load(path)
    assert type(loaded).__name__ == "Lasso"
    assert np.allclose(loaded._beta.get(), model._beta.get())
    assert np.allclose(
        loaded.predict(X).get(), model.predict(X).get()
    )
