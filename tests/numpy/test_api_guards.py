"""The facade's unsupported-option guards (numpy/api.py): every
``NotImplementedError`` branch must be a REACHABLE guard with a clear
message, not dead code — and the supported conversions around them
must work (scalar promotion, dtype/copy semantics of ``array``)."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


import nums_tpu.numpy as nps  # noqa: E402


def test_array_option_guards_and_conversions():
    with pytest.raises(NotImplementedError):
        nps.array([1.0], order="C")
    with pytest.raises(NotImplementedError):
        nps.array([1.0], ndmin=2)
    with pytest.raises(ValueError):
        nps.array([1.0], subok=True)
    a = nps.array([1.0, 2.0])
    b = nps.array(a)  # copy=True default: a distinct array
    assert np.allclose(b.get(), a.get())
    c = nps.array(a, dtype=np.int64)
    assert c.dtype == np.int64 and list(c.get()) == [1, 2]
    s = nps.sum(3.5)  # scalar promotion through _to_ba
    assert float(s) == 3.5


def test_reduction_option_guards():
    x = nps.array(np.arange(6.0).reshape(2, 3))
    sink = np.empty(3)
    for fn in (nps.min, nps.max, nps.sum):
        with pytest.raises(NotImplementedError):
            fn(x, out=sink)
        with pytest.raises(NotImplementedError):
            fn(x, where=np.ones((2, 3), bool))
    for fn in (nps.min, nps.max):
        with pytest.raises(NotImplementedError):
            fn(x, initial=0.0)
    with pytest.raises(NotImplementedError):
        nps.mean(x, out=sink)
    with pytest.raises(NotImplementedError):
        nps.argmin(x, out=sink)
    with pytest.raises(NotImplementedError):
        nps.argmax(x, out=sink)
    with pytest.raises(NotImplementedError):
        nps.transpose(x, axes=(1, 0))
