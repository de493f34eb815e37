"""Distributed linalg oracle tests (parity: reference test_linalg.py:109-190
— reconstruction checks at 1e-6 fp64 / 1e-4 fp32, regression residuals)."""

import numpy as np
import pytest


def _ortho_check(q, atol):
    n = q.shape[1]
    assert np.allclose(q.T @ q, np.eye(n), atol=atol)


@pytest.mark.parametrize("dtype,atol", [(np.float64, 1e-6), (np.float32, 1e-3)])
def test_tsqr_reconstruction(app_inst, dtype, atol):
    rs = np.random.RandomState(0)
    x = rs.randn(1000, 16).astype(dtype)
    bx = app_inst.array(x, block_shape=(125, 16))
    # indirect: R only
    r = app_inst.indirect_tsr(bx).get()
    assert r.shape == (16, 16)
    assert np.allclose(r.T @ r, x.T @ x, atol=atol * 100)
    # indirect tsqr: Q R == X
    q, r2 = app_inst.indirect_tsqr(bx)
    assert np.allclose(q.get() @ r2.get(), x, atol=atol)
    # direct tsqr: Q orthonormal, QR == X, R upper triangular
    q3, r3 = app_inst.direct_tsqr(bx)
    q3, r3 = q3.get(), r3.get()
    _ortho_check(q3, atol)
    assert np.allclose(q3 @ r3, x, atol=atol)
    assert np.allclose(r3, np.triu(r3), atol=atol)


def test_qr_alias(app_inst):
    rs = np.random.RandomState(1)
    x = rs.randn(300, 8)
    bx = app_inst.array(x, block_shape=(75, 8))
    q, r = app_inst.qr(bx)
    assert np.allclose(q.get() @ r.get(), x, atol=1e-8)


@pytest.mark.parametrize("dtype,atol", [(np.float64, 1e-6), (np.float32, 1e-3)])
def test_svd(app_inst, dtype, atol):
    rs = np.random.RandomState(2)
    x = rs.randn(600, 12).astype(dtype)
    bx = app_inst.array(x, block_shape=(100, 12))
    u, s, vt = app_inst.svd(bx)
    u, s, vt = u.get(), s.get(), vt.get()
    assert np.allclose(u @ np.diag(s) @ vt, x, atol=atol)
    _ortho_check(u, atol)
    assert np.allclose(np.sort(s), np.sort(np.linalg.svd(x, compute_uv=False)),
                       atol=atol)


def test_inv_cholesky(app_inst):
    rs = np.random.RandomState(3)
    a = rs.randn(20, 20)
    spd = a.T @ a + 20 * np.eye(20)
    ba = app_inst.array(spd, block_shape=(5, 10))
    assert np.allclose(app_inst.inv(ba).get(), np.linalg.inv(spd), atol=1e-8)
    l = app_inst.cholesky(ba).get()
    assert np.allclose(l @ l.T, spd, atol=1e-8)
    assert np.allclose(l, np.tril(l))


def test_regressions(app_inst):
    rs = np.random.RandomState(4)
    n, d = 500, 6
    x = rs.randn(n, d)
    theta_true = rs.randn(d)
    y = x @ theta_true + 1e-3 * rs.randn(n)
    bx = app_inst.array(x, block_shape=(100, d))
    by = app_inst.array(y, block_shape=(100,))
    expected = np.linalg.lstsq(x, y, rcond=None)[0]
    for fn in [
        app_inst.fast_linear_regression,
        app_inst.linear_regression,
        app_inst.lstsq,
    ]:
        theta = fn(bx, by).get()
        assert np.allclose(theta, expected, atol=1e-6), fn.__name__
    # ridge with tiny lambda ≈ OLS
    theta_r = app_inst.ridge_regression(bx, by, 1e-8).get()
    assert np.allclose(theta_r, expected, atol=1e-4)
    # ridge shrinks norm
    theta_r2 = app_inst.ridge_regression(bx, by, 1e3).get()
    assert np.linalg.norm(theta_r2) < np.linalg.norm(expected)


def test_posdef_solve(app_inst):
    rs = np.random.RandomState(5)
    a = rs.randn(12, 12)
    spd = a @ a.T + 12 * np.eye(12)
    b = rs.randn(12)
    ba = app_inst.array(spd, block_shape=(6, 6))
    bb = app_inst.array(b, block_shape=(6,))
    assert np.allclose(
        app_inst.posdef_solve(ba, bb).get(), np.linalg.solve(spd, b), atol=1e-8
    )


def test_norm(app_inst):
    rs = np.random.RandomState(6)
    v = rs.randn(100)
    bv = app_inst.array(v, block_shape=(25,))
    assert np.allclose(float(app_inst.norm(bv)), np.linalg.norm(v))


def test_wide_matrix_qr(app_inst):
    """m < n routes to the Householder path (CholeskyQR needs full column
    rank)."""
    rs = np.random.RandomState(7)
    x = rs.randn(6, 20)
    bx = app_inst.array(x, block_shape=(3, 10))
    q, r = app_inst.direct_tsqr(bx)
    assert q.shape == (6, 6) and r.shape == (6, 20)
    assert np.allclose(q.get() @ r.get(), x, atol=1e-9)
    u, s, vt = app_inst.svd(bx)
    assert np.allclose(u.get() @ np.diag(s.get()) @ vt.get(), x, atol=1e-9)
