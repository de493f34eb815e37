"""Multi-level recursion paths of the TSQR kernel family
(``core/ops/linalg.py``): the default chunk (8192) means the tree
branches only fire for matrices larger than the default-tier oracle
tests use — drive them directly with a small chunk."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


from nums_tpu.core.ops import linalg  # noqa: E402


def _x(m=1000, n=8):
    rs = np.random.RandomState(0)
    return rs.randn(m, n).astype(np.float32)


def test_tsqr_r_multilevel_tree():
    x = _x()  # 1000 rows over chunk=64: ~3 combine levels, ragged pads
    r = np.asarray(linalg.tsqr_r(chunk=64)(x))
    assert r.shape == (8, 8)
    assert np.allclose(r.T @ r, x.T @ x, atol=5e-3 * np.abs(x.T @ x).max())


def test_direct_tsqr_multilevel_recursion():
    x = _x()
    q, r = linalg.direct_tsqr(chunk=64)(x)
    q, r = np.asarray(q), np.asarray(r)
    assert q.shape == (1000, 8) and r.shape == (8, 8)
    assert np.allclose(q @ r, x, atol=1e-3)
    assert np.allclose(q.T @ q, np.eye(8), atol=1e-3)
    # Exact-multiple rows hit the no-pad branch.
    x2 = _x(m=256)
    q2, r2 = linalg.direct_tsqr(chunk=64)(x2)
    assert np.allclose(np.asarray(q2) @ np.asarray(r2), x2, atol=1e-3)


def test_svd_and_randomized_svd_kernels():
    x = _x()
    u, s, vt = (np.asarray(v) for v in linalg.svd(chunk=64)(x))
    assert np.allclose(u @ np.diag(s) @ vt, x, atol=1e-3)
    assert np.allclose(
        np.sort(s), np.sort(np.linalg.svd(x, compute_uv=False)),
        rtol=1e-3,
    )
    rs = np.random.RandomState(1)
    omega = rs.randn(8, 6).astype(np.float32)
    uk, sk, vtk = (
        np.asarray(v)
        for v in linalg.randomized_svd(k=3, n_iter=2, chunk=64)(x, omega)
    )
    assert uk.shape == (1000, 3) and sk.shape == (3,)
    ref = np.linalg.svd(x, compute_uv=False)[:3]
    assert np.allclose(np.sort(sk), np.sort(ref), rtol=5e-2)
