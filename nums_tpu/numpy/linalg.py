"""nums_tpu.numpy.linalg (parity: ``nums/numpy/linalg.py:20-23``).

The reference exposes reduced ``qr`` only; we add the rest of the
distributed linalg the application layer supports.
"""

from nums_tpu.core.application_manager import instance as _instance


def qr(a, mode="reduced"):
    if mode != "reduced":
        raise NotImplementedError("Only reduced QR is supported.")
    return _instance().qr(a)


def svd(a, full_matrices=False, compute_uv=True):
    if full_matrices:
        raise NotImplementedError("Only reduced SVD is supported.")
    u, s, vt = _instance().svd(a)
    if compute_uv:
        return u, s, vt
    return s


def inv(a):
    return _instance().inv(a)


def cholesky(a):
    return _instance().cholesky(a)


def lstsq(a, b):
    return _instance().lstsq(a, b)


def norm(a):
    return _instance().norm(a)
