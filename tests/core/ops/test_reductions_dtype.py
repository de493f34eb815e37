"""The dtype-parameterized paths of the reduction kernel vocabulary
(``core/ops/reductions.py``): accumulator-dtype reductions for the
sum family (jnp's ``dtype=`` kwarg) and the cast-after path for ops
without one — plus the facade surface that reaches them."""

import numpy as np
import pytest

from nums_tpu.core.ops import reductions


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


import nums_tpu.numpy as nps  # noqa: E402


def test_dtype_aware_accumulator():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    k = reductions.reduce("sum", None, False, "float64")
    out = np.asarray(k(x))
    assert out.dtype == np.float64 or out.dtype == np.float32  # x64 gate
    assert np.allclose(out, x.sum())
    k2 = reductions.reduce("prod", 0, True, "float32")
    assert np.allclose(np.asarray(k2(x)), x.prod(axis=0, keepdims=True))


def test_cast_after_for_non_dtype_aware_op():
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    k = reductions.reduce("max", 1, False, "int32")
    out = np.asarray(k(x))
    assert out.dtype == np.int32
    assert np.array_equal(out, x.max(axis=1).astype(np.int32))
    # Transposed variant composes with the cast.
    kt = reductions.reduce("min", 0, False, "int32", transposed=True)
    assert np.array_equal(
        np.asarray(kt(x)), x.T.min(axis=0).astype(np.int32)
    )


def test_facade_reaches_dtype_paths():
    x_np = np.arange(10, dtype=np.float32).reshape(2, 5)
    x = nps.array(x_np)
    got = nps.sum(x, dtype=np.float64)
    assert np.allclose(float(got), x_np.sum())
    got = nps.nansum(x, axis=0, dtype=np.float32)
    assert np.allclose(got.get(), x_np.sum(axis=0))
