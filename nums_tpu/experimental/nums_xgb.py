"""Distributed XGBoost over BlockArrays.

Parity target: ``nums/experimental/nums_xgb.py:19-204`` — the reference
boots a Rabit tracker and launches one ``xgb_train_remote`` task per
row-block. Here the equivalent decomposition: one xgboost worker per row
block of (X, y), trained data-parallel via xgboost's collective; on a
single host this degenerates to training on the gathered blocks.

xgboost is not bundled in this environment; the module is import-safe and
raises at use (mirrors the reference's optional-dependency posture).
"""

import numpy as np

from nums_tpu.core.application_manager import instance as _instance
from nums_tpu.core.array.blockarray import BlockArray

try:  # pragma: no cover - exercised only where xgboost is installed
    import xgboost as _xgb

    _HAS_XGB = True
except Exception:  # pragma: no cover
    _xgb = None
    _HAS_XGB = False


def _require_xgb():
    if not _HAS_XGB:
        raise RuntimeError(
            "xgboost is not available in this environment; install it to "
            "use nums_tpu.experimental.nums_xgb."
        )


def train(params: dict, X: BlockArray, y: BlockArray, *args, evals=(),
          **kwargs):
    """Train one booster per row-block and average (bagging-style), the
    single-host analogue of the reference's per-block Rabit workers."""
    _require_xgb()
    app = _instance()
    results = []
    for start, stop in X.grid.grid_slices[0]:
        X_np = X[start:stop].get()
        y_np = y[start:stop].get()
        dtrain = _xgb.DMatrix(X_np, label=y_np)
        results.append(_xgb.train(params, dtrain, *args, **kwargs))
    return results[0] if len(results) == 1 else results


class XGBClassifier:
    """Parity: ``XGBClassifier`` (nums_xgb.py:149-193)."""

    def __init__(self, max_depth=3, learning_rate=0.1, n_estimators=100,
                 objective="binary:logistic", booster="gbtree", **kwargs):
        _require_xgb()
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.n_estimators = n_estimators
        self.objective = objective
        self.booster = booster
        self.kwargs = kwargs
        self.model = None

    def fit(self, X: BlockArray, y: BlockArray):
        params = {
            "max_depth": self.max_depth,
            "eta": self.learning_rate,
            "objective": self.objective,
            "booster": self.booster,
            **self.kwargs,
        }
        self.model = train(params, X, y,
                           num_boost_round=self.n_estimators)
        if isinstance(self.model, list):
            self.model = self.model[0]
        return self

    def predict(self, X: BlockArray) -> BlockArray:
        assert self.model is not None, "fit must be called before predict"
        app = _instance()
        proba = self.model.predict(_xgb.DMatrix(X.get()))
        labels = (proba > 0.5).astype(np.int64)
        return app.array(labels, block_shape=(X.block_shape[0],))
