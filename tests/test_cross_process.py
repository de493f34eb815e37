"""Cross-process persistence: arrays and fitted models written by one
process must restore in a fresh interpreter (the serving scenario)."""

import json
import subprocess
import sys

import numpy as np


_WRITER = """
import os
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from nums_tpu.core import settings, application_manager
settings.backend_name = "serial"
app = application_manager.instance()
from nums_tpu.core.io.datasets import BimodalGaussian
from nums_tpu.models.glms import LogisticRegression

path = {path!r}
rs = np.random.RandomState(0)
arr = rs.randn(24, 6)
app.write_fs(app.array(arr, block_shape=(8, 3)), path + "/arr")

real_X, real_y = BimodalGaussian.get_dataset(300, 4)
X = app.array(real_X, block_shape=(100, 4))
y = app.array(real_y, block_shape=(100,))
m = LogisticRegression(solver="newton", tol=1e-8, max_iter=10)
m.fit(X, y)
m.save(path + "/model")
acc = float((m.predict(X).get() == real_y).mean())
print("WRITER_OK", acc)
"""

_READER = """
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from nums_tpu.core import settings, application_manager
settings.backend_name = "serial"
app = application_manager.instance()
from nums_tpu.core.io.datasets import BimodalGaussian
from nums_tpu.models.glms import GLM

path = {path!r}
back = app.read_fs(path + "/arr")
rs = np.random.RandomState(0)
assert np.allclose(back.get(), rs.randn(24, 6))

m = GLM.load(path + "/model")
real_X, real_y = BimodalGaussian.get_dataset(300, 4)
X = app.array(real_X, block_shape=(100, 4))
acc = float((m.predict(X).get() == real_y).mean())
print("READER_OK", acc)
"""


def _run(code):
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_cross_process_persistence(tmp_path):
    path = str(tmp_path)
    w = _run(_WRITER.format(path=path))
    assert "WRITER_OK" in w
    acc_w = float(w.split("WRITER_OK")[1].strip())
    r = _run(_READER.format(path=path))
    assert "READER_OK" in r
    acc_r = float(r.split("READER_OK")[1].strip())
    assert acc_r == acc_w > 0.95