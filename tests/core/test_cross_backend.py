"""Cross-backend determinism: the same program must produce (numerically
indistinguishable) results on the serial device and the 8-device mesh —
the property that makes debug-on-one-chip/deploy-on-pod trustworthy."""

import numpy as np

from nums_tpu.core import settings, application_manager
from nums_tpu.core.io.datasets import BimodalGaussian


def _pipeline(app):
    rs = app.random_state(1234)
    X = rs.normal(shape=(512, 16), block_shape=(64, 8))
    y = rs.random(shape=(512,), block_shape=(64,))
    g = (X.T @ X).get()
    s = app.sum(X, axis=0).get()
    q, r = app.direct_tsqr(X)
    theta = app.linear_regression(X, y).get()

    from nums_tpu.models.glms import LogisticRegression

    real_X, real_y = BimodalGaussian.get_dataset(400, 6)
    bx = app.array(real_X, block_shape=(100, 6))
    by = app.array(real_y, block_shape=(100,))
    m = LogisticRegression(solver="newton", tol=1e-10, max_iter=8)
    m.fit(bx, by)
    return {
        "gram": g,
        "sum": s,
        "qr": q.get() @ r.get(),
        "theta": theta,
        "beta": m._beta.get(),
        "rng": X.get(),
    }


def test_serial_vs_mesh_identical():
    results = {}
    for name in ("serial", "mesh"):
        settings.backend_name = name
        application_manager.destroy()
        app = application_manager.instance()
        application_manager.set_instance(app)
        results[name] = _pipeline(app)
    application_manager.destroy()
    settings.backend_name = "serial"
    for key in results["serial"]:
        a, b = results["serial"][key], results["mesh"][key]
        # RNG is counter-based: bitwise identical. Reductions may reorder
        # partial sums across shards: allow ~1e-12 relative.
        if key == "rng":
            assert np.array_equal(a, b), key
        else:
            assert np.allclose(a, b, rtol=1e-10, atol=1e-10), key