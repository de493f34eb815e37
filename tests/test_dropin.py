"""Drop-in compatibility: the reference's own example code, verbatim.

The code below is the reference's examples/logistic_regression.py with
only the package name changed. (Notably, this exact flow crashes on the
reference fork itself — fit→predict shape mismatch from its removed
intercept handling; verified directly against /root/reference.)
"""

import numpy as np


def test_reference_example_verbatim(nps_app_inst):
    from nums_tpu import numpy as nps
    from nums_tpu.models.glms import LogisticRegression

    nps.random.seed(1337)
    X1 = nps.random.randn(500, 1) + 5.0
    y1 = nps.zeros(shape=(500,), dtype=bool)
    X2 = nps.random.randn(500, 1) + 10.0
    y2 = nps.ones(shape=(500,), dtype=bool)
    X = nps.concatenate([X1, X2], axis=0)
    y = nps.concatenate([y1, y2], axis=0)

    model = LogisticRegression(solver="newton-cg", tol=1e-8, max_iter=10)
    model.fit(X, y)
    y_pred = model.predict(X)
    acc = (nps.sum(y == y_pred) / X.shape[0]).get()
    assert acc > 0.95, acc


def test_reference_io_verbs_verbatim(nps_app_inst, tmp_path):
    """nums.read/write/delete usage pattern from the reference README."""
    import nums_tpu
    from nums_tpu import numpy as nps

    x = nps.random.rand(100, 4)
    path = str(tmp_path / "array")
    nums_tpu.write(x, path)
    x2 = nums_tpu.read(path)
    assert np.allclose(x.get(), x2.get())
    nums_tpu.delete(path)
