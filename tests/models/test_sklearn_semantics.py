"""Regression tests for sklearn-convention semantics (round-2 review):

- Ridge/Lasso/ElasticNet never penalize the intercept;
- Lasso/ElasticNet use sklearn's alpha (1/(2n) residual convention);
- Ridge penalization works on the EAGER Newton path too;
- GLM.load restores Ridge's saved solver;
- TruncatedSVD explained_variance_ follows sklearn (var of the
  transformed columns), meaningful on non-centered data;
- GBDT/piecewise kernel caches are not keyed on data-dependent values.
"""

import numpy as np
import pytest


def _regression_data(seed=0, n=400, d=5, intercept=10.0, noise=0.01):
    rs = np.random.RandomState(seed)
    X = rs.randn(n, d)
    theta = np.linspace(1.0, 2.0, d) * np.sign(np.cos(np.arange(d)))
    y = X @ theta + intercept + rs.randn(n) * noise
    return X, y, theta


def test_lasso_intercept_unpenalized(nps_app_inst):
    from nums_tpu.models.glms import Lasso

    real_X, real_y, _ = _regression_data(intercept=10.0)
    X = nps_app_inst.array(real_X, block_shape=(100, 5))
    y = nps_app_inst.array(real_y, block_shape=(100,))
    m = Lasso(alpha=0.1, max_iter=500, tol=1e-7).fit(X, y)
    # sklearn recovers the intercept exactly; a penalized intercept
    # would be soft-thresholded / biased by lambda.
    assert abs(float(m.intercept_.get()) - 10.0) < 0.2


def test_lasso_alpha_max_zeroes_coefficients(nps_app_inst):
    # Classical lasso fact under sklearn's convention: for
    # alpha >= max|Xc^T (y - ybar)| / n the solution is all-zero
    # coefficients with intercept = mean(y). This pins the alpha SCALE:
    # without the internal n*alpha conversion this alpha would be
    # essentially unregularized.
    from nums_tpu.models.glms import Lasso

    real_X, real_y, _ = _regression_data(intercept=3.0, noise=0.1)
    n = real_X.shape[0]
    Xc = real_X - real_X.mean(axis=0)
    alpha_max = np.abs(Xc.T @ (real_y - real_y.mean())).max() / n
    X = nps_app_inst.array(real_X, block_shape=(100, 5))
    y = nps_app_inst.array(real_y, block_shape=(100,))
    m = Lasso(alpha=float(alpha_max) * 1.1, max_iter=500, tol=1e-7)
    m.fit(X, y)
    coef = m.coef_.get()
    assert np.max(np.abs(coef)) < 1e-2, coef
    assert abs(float(m.intercept_.get()) - real_y.mean()) < 0.05


def _ridge_oracle(real_X, real_y, alpha):
    # Closed form with UNPENALIZED intercept: augmented system with
    # diag([alpha]*d + [0]).
    n, d = real_X.shape
    Xa = np.concatenate([real_X, np.ones((n, 1))], axis=1)
    P = np.diag([alpha] * d + [0.0])
    return np.linalg.solve(Xa.T @ Xa + P, Xa.T @ real_y)


@pytest.mark.parametrize("fuse", ["1", "0"])
def test_ridge_matches_closed_form(nps_app_inst, fuse):
    from nums_tpu.core import settings
    from nums_tpu.models.glms import Ridge

    real_X, real_y, _ = _regression_data(n=300, d=4, intercept=-2.0)
    X = nps_app_inst.array(real_X, block_shape=(75, 4))
    y = nps_app_inst.array(real_y, block_shape=(75,))
    alpha = 50.0
    want = _ridge_oracle(real_X, real_y, alpha)
    old = settings.glm_fuse
    try:
        settings.glm_fuse = fuse  # "0" exercises the EAGER Newton path
        m = Ridge(alpha=alpha, tol=1e-10, max_iter=50).fit(X, y)
    finally:
        settings.glm_fuse = old
    got = np.concatenate([m.coef_.get(), [float(m.intercept_.get())]])
    assert np.allclose(got, want, atol=1e-4), (got, want)
    # Sanity: the penalty actually bit (OLS differs).
    ols = _ridge_oracle(real_X, real_y, 0.0)
    assert not np.allclose(ols[:-1], want[:-1], atol=1e-3)


def test_elasticnet_reduces_to_sklearn_scale(nps_app_inst):
    # l1_ratio=1.0 ElasticNet == Lasso (same alpha convention).
    from nums_tpu.models.glms import ElasticNet, Lasso

    real_X, real_y, _ = _regression_data(seed=3, intercept=1.0, noise=0.1)
    X = nps_app_inst.array(real_X, block_shape=(100, 5))
    y = nps_app_inst.array(real_y, block_shape=(100,))
    kw = dict(alpha=0.05, max_iter=500, tol=1e-8)
    b_en = ElasticNet(l1_ratio=1.0, **kw).fit(X, y).coef_.get()
    b_la = Lasso(**kw).fit(X, y).coef_.get()
    assert np.allclose(b_en, b_la, atol=1e-4)


def test_ridge_save_load_restores_solver(nps_app_inst, tmp_path):
    from nums_tpu.models.glms import GLM, Ridge

    real_X, real_y, _ = _regression_data(n=200, d=3)
    X = nps_app_inst.array(real_X, block_shape=(50, 3))
    y = nps_app_inst.array(real_y, block_shape=(50,))
    m = Ridge(alpha=1.0, solver="admm", max_iter=50)
    m.fit(X, y)
    m.save(str(tmp_path / "ridge_model"))
    m2 = GLM.load(str(tmp_path / "ridge_model"))
    assert type(m2) is Ridge
    assert m2._opt == "admm"
    assert np.allclose(m2.coef_.get(), m.coef_.get())


def test_truncated_svd_explained_variance_non_centered(nps_app_inst):
    from nums_tpu.models.decomposition import TruncatedSVD

    rs = np.random.RandomState(0)
    real_X = rs.randn(500, 6) + 10.0  # strongly non-centered
    k = 2
    X = nps_app_inst.array(real_X, block_shape=(125, 6))
    m = TruncatedSVD(n_components=k).fit(X)
    # sklearn semantics: var of the transformed columns over total var.
    _, _, vt = np.linalg.svd(real_X, full_matrices=False)
    # Align signs with the model's sign convention before projecting.
    comps = m.components_.get()
    signs = np.sign(np.sum(comps * vt[:k], axis=1))
    Xt = real_X @ (vt[:k] * signs[:, None]).T
    want_ev = Xt.var(axis=0)
    want_ratio = want_ev / real_X.var(axis=0).sum()
    assert np.allclose(m.explained_variance_.get(), want_ev, rtol=1e-4)
    assert np.allclose(
        m.explained_variance_ratio_.get(), want_ratio, rtol=1e-4
    )
    assert float(m.explained_variance_ratio_.get().sum()) <= 1.0 + 1e-6


def test_gbt_kernel_cache_not_keyed_on_data(nps_app_inst):
    from nums_tpu.models import trees
    from nums_tpu.models.trees import GBTRegressor

    trees._train_kernel.cache_clear()
    trees._predict_kernel.cache_clear()
    rs = np.random.RandomState(0)
    for seed_shift in range(3):  # three datasets, three base_scores
        real_X = rs.randn(200, 4)
        real_y = real_X[:, 0] * 2 + float(seed_shift) * 5.0
        X = nps_app_inst.array(real_X, block_shape=(50, 4))
        y = nps_app_inst.array(real_y, block_shape=(50,))
        m = GBTRegressor(n_estimators=3, max_depth=2).fit(X, y)
        m.predict(X).get()
    assert trees._train_kernel.cache_info().currsize == 1
    assert trees._predict_kernel.cache_info().currsize == 1


def test_piecewise_kernel_cache_structural(nps_app_inst):
    import nums_tpu.numpy as nps
    from nums_tpu.numpy import tail

    tail._piecewise_cache.clear()
    x_np = np.linspace(-2, 2, 64, dtype=np.float32)
    x = nps.array(x_np)
    for _ in range(3):  # fresh lambda OBJECTS, same code objects
        out = nps.piecewise(x, [x < 0, x >= 0], [lambda v: -v, lambda v: v])
    want = np.piecewise(
        x_np, [x_np < 0, x_np >= 0], [lambda v: -v, lambda v: v]
    )
    assert np.allclose(out.get(), want)
    assert len(tail._piecewise_cache) == 1


def test_fitted_penalized_gradient_callable(nps_app_inst):
    """grad_norm_sq / gradient on a FITTED penalized model (beta=None,
    unaugmented X) must work — review finding: the l2 branch asserted
    beta is not None and would shape-mismatch lambda_vec."""
    from nums_tpu.models.glms import LogisticRegression, Ridge

    real_X, real_y, _ = _regression_data(n=200, d=4)
    X = nps_app_inst.array(real_X, block_shape=(50, 4))
    y = nps_app_inst.array(real_y, block_shape=(50,))
    r = Ridge(alpha=0.5).fit(X, y)
    assert np.isfinite(float(r.grad_norm_sq(X, y).get()))
    yb = (real_y > real_y.mean()).astype(np.float64)
    by = nps_app_inst.array(yb, block_shape=(50,))
    m = LogisticRegression(penalty="l2", C=2.0, solver="newton",
                           max_iter=5).fit(X, by)
    assert np.isfinite(float(m.grad_norm_sq(X, by).get()))


def test_piecewise_cache_sees_global_changes(nps_app_inst):
    import nums_tpu.numpy as nps
    from nums_tpu.numpy import tail

    tail._piecewise_cache.clear()
    x_np = np.array([-2.0, 3.0], dtype=np.float32)
    x = nps.array(x_np)
    global _PW_GAIN
    _PW_GAIN = 10.0
    out1 = nps.piecewise(
        x, [x < 0, x >= 0], [lambda t: t * _PW_GAIN, lambda t: t]
    ).get()
    _PW_GAIN = 1000.0
    out2 = nps.piecewise(
        x, [x < 0, x >= 0], [lambda t: t * _PW_GAIN, lambda t: t]
    ).get()
    assert np.allclose(out1, [-20.0, 3.0])
    assert np.allclose(out2, [-2000.0, 3.0])


def test_log_loss_sklearn_column_order(nps_app_inst):
    from nums_tpu.models import metrics

    labels = np.array([0.0, 1.0, 1.0, 0.0])
    p1 = np.array([0.1, 0.9, 0.8, 0.2])  # P(class 1)
    mat = np.stack([1 - p1, p1], axis=1)  # sklearn layout: col 1 = P(1)
    bl = nps_app_inst.array(labels, block_shape=(4,))
    bm = nps_app_inst.array(mat, block_shape=(4, 2))
    want = -np.mean(labels * np.log(p1) + (1 - labels) * np.log(1 - p1))
    assert np.isclose(float(metrics.log_loss(bl, bm).get()), want)


def test_glm_predict_proba_sklearn_layout(nps_app_inst):
    """Column 1 = P(class 1): rows predicted 1 must have proba[:,1]>0.5
    (the reference emits the reverse order; DIVERGENCES.md #12)."""
    from nums_tpu.core.io.datasets import BimodalGaussian
    from nums_tpu.models.glms import LogisticRegression

    real_X, real_y = BimodalGaussian.get_dataset(300, 4)
    X = nps_app_inst.array(real_X, block_shape=(75, 4))
    y = nps_app_inst.array(real_y, block_shape=(75,))
    m = LogisticRegression(solver="newton", max_iter=10).fit(X, y)
    proba = m.predict_proba(X).get()
    pred = m.predict(X).get()
    assert np.array_equal(pred == 1, proba[:, 1] > 0.5)
    # log_loss consumes the layout directly for a sensible loss.
    from nums_tpu.models import metrics

    ll = float(metrics.log_loss(
        y, nps_app_inst.array(proba, block_shape=(75, 2))).get())
    assert ll < 0.2, ll
