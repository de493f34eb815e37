"""Evaluation metrics over BlockArrays (sklearn-style surface).

Beyond the reference's model zoo (it evaluates ad hoc inside tests,
e.g. accuracy by hand in ``tests/models/test_glms.py`` there). Every
metric is a BlockArray expression: it stays deferred under lazy
batching (fusing into the caller's chain) and returns a SCALAR
BlockArray — ``float(score)`` materializes it.
"""

import numpy as np

from nums_tpu.core.application_manager import instance as _instance
from nums_tpu.core.array.blockarray import BlockArray
from nums_tpu.models._common import _to_ba

__all__ = [
    "accuracy_score", "mean_squared_error", "mean_absolute_error",
    "r2_score", "log_loss",
]


def accuracy_score(y_true, y_pred):
    """Fraction of exact matches."""
    y_true, y_pred = _to_ba(y_true), _to_ba(y_pred)
    return (y_true == y_pred).astype(np.float64).mean()


def mean_squared_error(y_true, y_pred):
    y_true, y_pred = _to_ba(y_true), _to_ba(y_pred)
    d = y_true - y_pred
    return (d * d).mean()


def mean_absolute_error(y_true, y_pred):
    y_true, y_pred = _to_ba(y_true), _to_ba(y_pred)
    return abs(y_true - y_pred).mean()


def r2_score(y_true, y_pred):
    """1 − SS_res/SS_tot (sklearn semantics, including the constant-
    y_true convention: 1.0 for a perfect fit, else 0.0 — a plain
    division there yields -inf/nan that poisons CV aggregation)."""
    app = _instance()
    y_true, y_pred = _to_ba(y_true), _to_ba(y_pred)
    d = y_true - y_pred
    ss_res = app.sum(d * d)
    c = y_true - y_true.mean()
    ss_tot = app.sum(c * c)
    one, zero = app.scalar(1.0), app.scalar(0.0)
    tot_zero = ss_tot == zero
    score = one - ss_res / app.where(tot_zero, one, ss_tot)
    return app.where(
        tot_zero, app.where(ss_res == zero, one, zero), score
    )


def log_loss(y_true, y_proba, eps=1e-15):
    """Binary cross-entropy. ``y_proba`` is P(class 1) — a vector, or an
    (n, 2) matrix in sklearn column order (column index == class label,
    so column 1 = P(1)) — the layout every predict_proba in this repo
    emits."""
    app = _instance()
    y_true, y_proba = _to_ba(y_true), _to_ba(y_proba)
    if y_proba.ndim == 2:
        assert y_proba.shape[1] == 2, y_proba.shape
        y_proba = y_proba[:, 1]
    p = y_proba.clip(eps, 1.0 - eps)
    return -(y_true * app.log(p) + (1.0 - y_true) * app.log(1.0 - p)).mean()
