"""nums_tpu.numpy.fft — scaffolding (parity: the reference's empty
``nums/numpy/fft.py``)."""
