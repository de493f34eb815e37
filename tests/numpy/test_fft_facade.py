"""Oracle tests for ``nums_tpu.numpy.fft`` (the reference ships an
EMPTY fft module — nums/numpy/fft.py there; this surface is the
framework's extension, previously exercised only via the coverage
CLI for the shift/freq helpers and the n/axis arguments)."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


import nums_tpu.numpy as nps  # noqa: E402
from nums_tpu.numpy import fft as nfft  # noqa: E402


def test_fft_with_n_and_axis():
    rs = np.random.RandomState(0)
    x_np = rs.randn(6, 10)
    x = nps.array(x_np)
    # n (pad/trim) and axis arguments hit the parameterized jit path.
    assert np.allclose(
        nfft.fft(x, n=16, axis=0).get(), np.fft.fft(x_np, n=16, axis=0),
        atol=1e-4,
    )
    assert np.allclose(
        nfft.ifft(x, n=4, axis=1).get(), np.fft.ifft(x_np, n=4, axis=1),
        atol=1e-5,
    )
    assert np.allclose(
        nfft.rfft(x, n=12).get(), np.fft.rfft(x_np, n=12), atol=1e-4
    )


def test_shift_and_freq_helpers():
    rs = np.random.RandomState(1)
    x_np = rs.randn(9)
    x = nps.array(x_np)
    assert np.allclose(nfft.fftshift(x).get(), np.fft.fftshift(x_np))
    assert np.allclose(nfft.ifftshift(x).get(), np.fft.ifftshift(x_np))
    assert np.allclose(nfft.fftfreq(8, d=0.5).get(),
                       np.fft.fftfreq(8, d=0.5))
    assert np.allclose(nfft.rfftfreq(8, d=2.0).get(),
                       np.fft.rfftfreq(8, d=2.0))
