"""Gradient-boosted trees (beyond the reference: its trees.py is an
empty placeholder). Oracle: problems a linear model cannot fit."""

import numpy as np
import pytest

from nums_tpu.models.trees import GBTClassifier, GBTRegressor


def test_classifier_learns_xor(app_inst):
    """XOR is the canonical linearly-inseparable problem: logistic
    regression gets ~50%; depth-2 trees must solve it."""
    rs = np.random.RandomState(0)
    n = 2000
    X = rs.uniform(-1, 1, (n, 2))
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(float)
    bX = app_inst.array(X, block_shape=(500, 2))
    by = app_inst.array(y, block_shape=(500,))
    clf = GBTClassifier(n_estimators=20, max_depth=3, learning_rate=0.3)
    clf.fit(bX, by)
    acc = float((clf.predict(bX).get() == y).mean())
    assert acc > 0.95, acc
    proba = clf.predict_proba(bX).get()
    # sklearn layout: column index == class index, rows sum to 1.
    assert proba.shape == (n, 2)
    assert ((proba >= 0) & (proba <= 1)).all()
    assert np.allclose(proba.sum(axis=1), 1.0)
    assert np.array_equal(
        clf.classes_[proba.argmax(axis=1)], clf.predict(bX).get()
    )
    # sanity: a linear model really can't do this
    from nums_tpu.models.glms import LogisticRegression

    lin = LogisticRegression(solver="newton", max_iter=10)
    lin.fit(bX, by)
    lin_acc = float((lin.predict(bX).get() == y).mean())
    assert lin_acc < 0.65


def test_regressor_learns_interaction(app_inst):
    rs = np.random.RandomState(1)
    n = 3000
    X = rs.uniform(-1, 1, (n, 3))
    y = X[:, 0] * X[:, 1] + 0.5 * (X[:, 2] > 0.3) + 0.01 * rs.randn(n)
    bX = app_inst.array(X, block_shape=(750, 3))
    by = app_inst.array(y, block_shape=(750,))
    reg = GBTRegressor(n_estimators=40, max_depth=4, learning_rate=0.2)
    reg.fit(bX, by)
    pred = reg.predict(bX).get()
    ss_res = float(((pred - y) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot
    assert r2 > 0.85, r2


def test_determinism_and_generalization(app_inst):
    rs = np.random.RandomState(2)
    X = rs.uniform(-1, 1, (1200, 2))
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(float)
    tr, te = slice(0, 1000), slice(1000, 1200)
    bXtr = app_inst.array(X[tr], block_shape=(250, 2))
    bytr = app_inst.array(y[tr], block_shape=(250,))
    bXte = app_inst.array(X[te], block_shape=(200, 2))
    m1 = GBTClassifier(n_estimators=15, max_depth=3).fit(bXtr, bytr)
    m2 = GBTClassifier(n_estimators=15, max_depth=3).fit(bXtr, bytr)
    p1, p2 = m1.predict(bXte).get(), m2.predict(bXte).get()
    assert np.array_equal(p1, p2)  # deterministic
    acc = float((p1 == y[te]).mean())
    assert acc > 0.9, acc


def test_ragged_rows(app_inst):
    """Mesh-indivisible sample count works end to end."""
    rs = np.random.RandomState(3)
    n = 1003
    X = rs.uniform(-1, 1, (n, 2))
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(float)
    bX = app_inst.array(X, block_shape=(126, 2))
    by = app_inst.array(y, block_shape=(126,))
    clf = GBTClassifier(n_estimators=15, max_depth=3).fit(bX, by)
    acc = float((clf.predict(bX).get() == y).mean())
    assert acc > 0.9, acc


def test_gbt_save_load(nps_app_inst, tmp_path):
    rs = np.random.RandomState(3)
    real_X = rs.randn(300, 5)
    real_y = (real_X[:, 0] + real_X[:, 1] > 0).astype(np.float64)
    X = nps_app_inst.array(real_X, block_shape=(100, 5))
    y = nps_app_inst.array(real_y, block_shape=(100,))
    m = GBTClassifier(n_estimators=5, max_depth=3).fit(X, y)
    m.save(str(tmp_path / "gbt"))
    m2 = GBTClassifier.load(str(tmp_path / "gbt"))
    assert np.array_equal(m2.predict(X).get(), m.predict(X).get())
    assert np.allclose(
        m2.predict_proba(X).get(), m.predict_proba(X).get()
    )


def test_gbt_multiclass_ovr(nps_app_inst):
    """3-class one-vs-rest: blobs with non-contiguous labels."""
    rs = np.random.RandomState(5)
    centers = np.array([[0.0, 0.0], [4.0, 4.0], [4.0, -4.0]])
    labels = np.array([2.0, 5.0, 9.0])  # non-0..k-1 labels
    X_np = np.concatenate([c + rs.randn(80, 2) * 0.5 for c in centers])
    y_np = np.repeat(labels, 80)
    perm = rs.permutation(len(X_np))
    X_np, y_np = X_np[perm], y_np[perm]
    X = nps_app_inst.array(X_np, block_shape=(60, 2))
    y = nps_app_inst.array(y_np, block_shape=(60,))
    m = GBTClassifier(n_estimators=10, max_depth=3).fit(X, y)
    assert np.array_equal(m.classes_, labels)
    pred = m.predict(X).get()
    assert set(np.unique(pred)) <= set(labels)
    assert (pred == y_np).mean() > 0.97
    proba = m.predict_proba(X).get()
    assert proba.shape == (240, 3)
    assert np.allclose(proba.sum(axis=1), 1.0)
    assert np.array_equal(labels[proba.argmax(axis=1)], pred)


def test_gbt_multiclass_save_load(nps_app_inst, tmp_path):
    rs = np.random.RandomState(6)
    X_np = np.concatenate(
        [c + rs.randn(50, 3) for c in (np.zeros(3), np.full(3, 4.0),
                                       np.array([4.0, 0, 4.0]))]
    )
    y_np = np.repeat([0.0, 1.0, 2.0], 50)
    X = nps_app_inst.array(X_np, block_shape=(50, 3))
    y = nps_app_inst.array(y_np, block_shape=(50,))
    m = GBTClassifier(n_estimators=5, max_depth=2).fit(X, y)
    m.save(str(tmp_path / "gbt3"))
    m2 = GBTClassifier.load(str(tmp_path / "gbt3"))
    assert np.array_equal(m2.classes_, m.classes_)
    assert np.array_equal(m2.predict(X).get(), m.predict(X).get())
    assert np.allclose(
        m2.predict_proba(X).get(), m.predict_proba(X).get()
    )
