"""model_selection + metrics: sklearn-style splitting/CV/metrics over
BlockArrays (the reference hand-rolls CV inside a test; here it's API)."""

import numpy as np
import pytest

from nums_tpu.models import metrics, model_selection


def test_train_test_split_shuffled(nps_app_inst):
    rs = np.random.RandomState(0)
    real_X = rs.randn(40, 3)
    real_y = rs.randn(40)
    X = nps_app_inst.array(real_X, block_shape=(10, 3))
    y = nps_app_inst.array(real_y, block_shape=(10,))
    X_tr, X_te, y_tr, y_te = model_selection.train_test_split(
        X, y, test_size=0.25, random_state=7
    )
    assert X_tr.shape == (30, 3) and X_te.shape == (10, 3)
    assert y_tr.shape == (30,) and y_te.shape == (10,)
    # Partition property: train ∪ test == original rows, disjoint.
    all_rows = np.concatenate([X_tr.get(), X_te.get()])
    assert np.allclose(
        np.sort(all_rows, axis=0), np.sort(real_X, axis=0)
    )
    # X and y split with the SAME permutation.
    key = {tuple(row): val for row, val in zip(real_X, real_y)}
    for row, val in zip(X_te.get(), y_te.get()):
        assert np.isclose(key[tuple(row)], val)
    # Deterministic per seed; different across seeds.
    X_tr2, _, _, _ = model_selection.train_test_split(
        X, y, test_size=0.25, random_state=7
    )
    assert np.allclose(X_tr.get(), X_tr2.get())


def test_train_test_split_unshuffled_and_sizes(nps_app_inst):
    x = np.arange(20.0)
    bx = nps_app_inst.array(x, block_shape=(5,))
    tr, te = model_selection.train_test_split(
        bx, shuffle=False, test_size=5
    )
    assert np.allclose(tr.get(), x[:15]) and np.allclose(te.get(), x[15:])
    tr, te = model_selection.train_test_split(
        bx, shuffle=False, train_size=0.6
    )
    assert tr.shape[0] == 12 and te.shape[0] == 8
    # Gap case (train+test < n): sklearn takes the test rows immediately
    # after the train rows, leaving the gap at the END.
    tr, te = model_selection.train_test_split(
        bx, shuffle=False, train_size=8, test_size=5
    )
    assert np.allclose(tr.get(), x[:8]) and np.allclose(te.get(), x[8:13])


def test_kfold_covers_everything(nps_app_inst):
    x = np.arange(23.0)
    bx = nps_app_inst.array(x, block_shape=(6,))
    for shuffle in (False, True):
        kf = model_selection.KFold(
            n_splits=4, shuffle=shuffle, random_state=3
        )
        seen = []
        for train, test in kf.split(bx):
            tr = bx[train].get()
            te = bx[test].get()
            assert len(tr) + len(te) == 23
            assert not set(tr) & set(te)
            seen.extend(te.tolist())
        # Test folds tile the dataset exactly once.
        assert sorted(seen) == x.tolist()


def test_cross_val_score_logistic(nps_app_inst):
    from nums_tpu.core.io.datasets import BimodalGaussian
    from nums_tpu.models.glms import LogisticRegression

    real_X, real_y = BimodalGaussian.get_dataset(400, 6)
    X = nps_app_inst.array(real_X, block_shape=(100, 6))
    y = nps_app_inst.array(real_y, block_shape=(100,))
    model = LogisticRegression(solver="newton", tol=1e-8, max_iter=10)
    scores = model_selection.cross_val_score(model, X, y, cv=4)
    assert scores.shape == (4,)
    assert np.all(scores > 0.9), scores


def test_metrics_against_sklearn_formulas(nps_app_inst):
    rs = np.random.RandomState(1)
    yt = rs.randn(50)
    yp = yt + rs.randn(50) * 0.3
    byt = nps_app_inst.array(yt, block_shape=(25,))
    byp = nps_app_inst.array(yp, block_shape=(25,))
    assert np.isclose(
        float(metrics.mean_squared_error(byt, byp).get()),
        np.mean((yt - yp) ** 2),
    )
    assert np.isclose(
        float(metrics.mean_absolute_error(byt, byp).get()),
        np.mean(np.abs(yt - yp)),
    )
    want_r2 = 1 - np.sum((yt - yp) ** 2) / np.sum((yt - yt.mean()) ** 2)
    assert np.isclose(float(metrics.r2_score(byt, byp).get()), want_r2)

    labels = (rs.rand(50) > 0.5).astype(np.float64)
    pred = (rs.rand(50) > 0.5).astype(np.float64)
    bl = nps_app_inst.array(labels, block_shape=(25,))
    bp = nps_app_inst.array(pred, block_shape=(25,))
    assert np.isclose(
        float(metrics.accuracy_score(bl, bp).get()), np.mean(labels == pred)
    )
    proba = np.clip(rs.rand(50), 1e-3, 1 - 1e-3)
    bpr = nps_app_inst.array(proba, block_shape=(25,))
    want_ll = -np.mean(
        labels * np.log(proba) + (1 - labels) * np.log(1 - proba)
    )
    assert np.isclose(float(metrics.log_loss(bl, bpr).get()), want_ll)


def test_split_validation(nps_app_inst):
    bx = nps_app_inst.array(np.arange(10.0), block_shape=(5,))
    with pytest.raises(AssertionError):
        model_selection.train_test_split(bx, test_size=10)
    with pytest.raises(AssertionError):
        model_selection.KFold(n_splits=1)


def test_cross_val_score_preserves_callers_model(nps_app_inst):
    """Review regression: CV fits per-fold COPIES (sklearn clone
    semantics) — the caller's fitted coefficients must survive."""
    from nums_tpu.models.glms import LinearRegression
    from nums_tpu.models.model_selection import cross_val_score

    rs = np.random.RandomState(1)
    real_X = rs.randn(60, 3)
    real_y = real_X @ np.array([1.0, -2.0, 3.0]) + 0.25
    X = nps_app_inst.array(real_X, block_shape=(20, 3))
    y = nps_app_inst.array(real_y, block_shape=(20,))
    m = LinearRegression().fit(X, y)
    coef_before = np.asarray(m._beta.get()).copy()
    scores = cross_val_score(m, X, y, cv=3)
    assert scores.shape == (3,)
    assert np.allclose(np.asarray(m._beta.get()), coef_before)


def test_r2_score_constant_y_true(nps_app_inst):
    """Review regression: sklearn's constant-target convention — 1.0
    for a perfect fit, 0.0 otherwise (not -inf/nan)."""
    from nums_tpu.models.metrics import r2_score

    const = nps_app_inst.array(np.full(8, 3.0), block_shape=(4,))
    other = nps_app_inst.array(np.arange(8.0), block_shape=(4,))
    perfect = float(r2_score(const, const).get())
    bad = float(r2_score(const, other).get())
    assert perfect == 1.0
    assert bad == 0.0
    # non-degenerate case unchanged
    s = float(r2_score(other, other).get())
    assert s == 1.0
