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
    assert proba.shape == (n,)
    assert ((proba >= 0) & (proba <= 1)).all()
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
