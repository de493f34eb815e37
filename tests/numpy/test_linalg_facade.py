"""Oracle tests for the extended ``nums_tpu.numpy.linalg`` surface
(the reference only ships reduced ``qr``, linalg.py:20-23 there; the
rest is this framework's extension and was previously exercised only
via the coverage CLI)."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


import nums_tpu.numpy as nps  # noqa: E402
from nums_tpu.numpy import linalg as nla  # noqa: E402


def _spd(rs, n):
    a = rs.randn(n, n)
    return a @ a.T + n * np.eye(n)


def test_factorizations_and_guards():
    rs = np.random.RandomState(0)
    a_np = rs.randn(12, 5)
    a = nps.array(a_np)
    q, r = nla.qr(a)
    assert np.allclose((q @ r).get(), a_np, atol=1e-5)
    with pytest.raises(NotImplementedError):
        nla.qr(a, mode="complete")
    u, s, vt = nla.svd(a)
    assert np.allclose(
        (u @ nps.diag(s) @ vt).get(), a_np, atol=1e-5
    )
    s_only = nla.svd(a, compute_uv=False)
    assert np.allclose(
        np.sort(s_only.get()), np.sort(np.linalg.svd(a_np)[1]), atol=1e-5
    )
    assert np.allclose(
        np.sort(nla.svdvals(a).get()),
        np.sort(np.linalg.svd(a_np)[1]), atol=1e-5,
    )
    with pytest.raises(NotImplementedError):
        nla.svd(a, full_matrices=True)


def test_square_matrix_functions():
    rs = np.random.RandomState(1)
    m_np = _spd(rs, 6)
    m = nps.array(m_np)
    assert np.allclose(nla.inv(m).get(), np.linalg.inv(m_np), atol=1e-4)
    assert np.allclose(
        nla.cholesky(m).get(), np.linalg.cholesky(m_np), atol=1e-4
    )
    assert np.allclose(
        float(nla.det(m)), np.linalg.det(m_np), rtol=1e-4
    )
    sign, logdet = nla.slogdet(m)
    o_sign, o_logdet = np.linalg.slogdet(m_np)
    assert float(sign) == o_sign
    assert np.allclose(float(logdet), o_logdet, rtol=1e-5)
    w, v = nla.eigh(m)
    assert np.allclose(w.get(), np.linalg.eigh(m_np)[0], atol=1e-4)
    assert np.allclose(
        (m @ v).get(), (v @ nps.diag(w)).get(), atol=1e-3
    )
    assert np.allclose(
        nla.eigvalsh(m).get(), np.linalg.eigvalsh(m_np), atol=1e-4
    )
    assert int(nla.matrix_rank(m)) == 6
    assert np.allclose(
        float(nla.cond(m)), np.linalg.cond(m_np), rtol=1e-3
    )
    with pytest.raises(NotImplementedError):
        nla.cond(m, p=1)
    assert np.allclose(
        nla.matrix_power(m, 3).get(),
        np.linalg.matrix_power(m_np, 3), rtol=1e-4,
    )


def test_solves_and_products():
    rs = np.random.RandomState(2)
    m_np = _spd(rs, 5)
    b_np = rs.randn(5)
    m, b = nps.array(m_np), nps.array(b_np)
    assert np.allclose(
        nla.solve(m, b).get(), np.linalg.solve(m_np, b_np), atol=1e-4
    )
    a_np = rs.randn(9, 4)
    a = nps.array(a_np)
    theta = nla.lstsq(a, nps.array(rs.randn(9)))
    assert theta.shape == (4,)
    assert np.allclose(
        nla.pinv(a).get(), np.linalg.pinv(a_np), atol=1e-4
    )
    c_np = rs.randn(4, 7)
    got = nla.multi_dot([a, nps.array(c_np), nps.array(rs.randn(7))])
    assert got.shape == (9,)
    assert np.allclose(
        nla.matmul(m, b).get(), m_np @ b_np, atol=1e-5
    )
    assert np.allclose(
        nla.tensordot(a, nps.array(c_np), axes=1).get(),
        np.tensordot(a_np, c_np, axes=1), atol=1e-4,
    )
    assert np.allclose(float(nla.norm(b)), np.linalg.norm(b_np))
    assert np.allclose(
        float(nla.vector_norm(b)), np.linalg.norm(b_np)
    )
    assert np.allclose(
        float(nla.matrix_norm(a)), np.linalg.norm(a_np, "fro"), rtol=1e-6
    )
    with pytest.raises(NotImplementedError):
        nla.matrix_norm(a, ord="nuc")
    assert np.allclose(nla.matrix_transpose(a).get(), a_np.T)
    assert np.allclose(nla.diagonal(m).get(), np.diagonal(m_np))


def test_vector_ops_and_tensor_solves():
    rs = np.random.RandomState(3)
    x_np, y_np = rs.randn(4, 3), rs.randn(4, 3)
    x, y = nps.array(x_np), nps.array(y_np)
    assert np.allclose(nla.cross(x, y).get(), np.cross(x_np, y_np))
    assert np.allclose(
        nla.vecdot(x, y).get(), np.sum(x_np * y_np, axis=-1), atol=1e-6
    )
    assert np.allclose(
        nla.outer(nps.array(x_np[0]), nps.array(y_np[0])).get(),
        np.outer(x_np[0], y_np[0]),
    )
    m_np = _spd(rs, 4)
    assert np.allclose(float(nla.trace(nps.array(m_np))), np.trace(m_np))
    t_np = rs.randn(2, 3, 6)
    b_np = rs.randn(2, 3)
    t, b = nps.array(t_np), nps.array(b_np)
    sol = nla.tensorsolve(t, b).get()
    assert np.allclose(sol, np.linalg.tensorsolve(t_np, b_np), atol=1e-4)
    ti_np = rs.randn(3, 2, 6)  # ind=2: (3*2) x 6 invertible view
    ti = nps.array(ti_np)
    assert np.allclose(
        nla.tensorinv(ti, ind=2).get(),
        np.linalg.tensorinv(ti_np, ind=2), atol=1e-3,
    )
