"""Public nums_tpu.numpy surface tests (parity: reference tests/numpy/*)."""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


import nums_tpu.numpy as nps  # noqa: E402


def test_constants_and_dtypes():
    assert nps.pi == np.pi
    assert nps.inf == np.inf
    assert np.isnan(nps.nan)
    assert nps.float64 is np.float64
    assert nps.bool_ is np.bool_


def test_creation():
    assert np.allclose(nps.zeros((5, 3)).get(), np.zeros((5, 3)))
    assert np.allclose(nps.ones(7).get(), np.ones(7))
    assert nps.empty((2, 2)).shape == (2, 2)
    x = nps.array([[1.0, 2.0], [3.0, 4.0]])
    assert np.allclose(x.get(), [[1, 2], [3, 4]])
    assert np.allclose(nps.zeros_like(x).get(), np.zeros((2, 2)))
    assert np.allclose(nps.ones_like(x, dtype=np.int64).get(), np.ones((2, 2)))
    assert nps.empty_like(x).dtype == np.float64
    assert np.allclose(nps.identity(4).get(), np.identity(4))
    assert np.allclose(nps.eye(3, 5).get(), np.eye(3, 5))
    assert np.allclose(nps.eye(3, 5, k=1).get(), np.eye(3, 5, k=1))
    assert np.allclose(nps.full((3, 2), 7.5).get(), np.full((3, 2), 7.5))


def test_arange_linspace_logspace():
    assert np.array_equal(nps.arange(10).get(), np.arange(10))
    assert np.array_equal(nps.arange(3, 10).get(), np.arange(3, 10))
    assert np.allclose(nps.linspace(2, 3, 11).get(), np.linspace(2, 3, 11))
    assert np.allclose(nps.logspace(0, 2, 5).get(), np.logspace(0, 2, 5))


def test_manipulation():
    x_np = np.arange(24).reshape(4, 6).astype(float)
    x = nps.array(x_np)
    assert np.allclose(nps.reshape(x, (6, 4)).get(), x_np.reshape(6, 4))
    assert np.allclose(nps.expand_dims(x, 0).get(), x_np[None])
    assert np.allclose(nps.squeeze(nps.expand_dims(x, 0)).get(), x_np)
    assert np.allclose(nps.transpose(x).get(), x_np.T)
    assert nps.ndim(x) == 2
    cat = nps.concatenate([x, x], axis=0)
    assert np.allclose(cat.get(), np.concatenate([x_np, x_np], axis=0))
    parts = nps.split(x, 2, axis=0)
    assert np.allclose(parts[0].get(), x_np[:2])
    assert np.allclose(nps.diag(nps.array(np.arange(4.0))).get(),
                       np.diag(np.arange(4.0)))


def test_reductions():
    rs = np.random.RandomState(0)
    x_np = rs.randn(10, 8)
    x = nps.array(x_np)
    assert np.allclose(nps.sum(x).get(), x_np.sum())
    assert np.allclose(nps.sum(x, axis=0).get(), x_np.sum(axis=0))
    assert np.allclose(nps.mean(x, axis=1, keepdims=True).get(),
                       x_np.mean(axis=1, keepdims=True))
    assert np.allclose(nps.var(x, ddof=1).get(), x_np.var(ddof=1))
    assert np.allclose(nps.std(x).get(), x_np.std())
    assert np.allclose(nps.min(x, axis=0).get(), x_np.min(axis=0))
    assert np.allclose(nps.max(x).get(), x_np.max())
    v = nps.array(x_np[:, 0])
    assert int(nps.argmax(v)) == int(np.argmax(x_np[:, 0]))
    assert int(nps.argmin(v)) == int(np.argmin(x_np[:, 0]))


def test_ufuncs_and_bops():
    rs = np.random.RandomState(1)
    x_np = np.abs(rs.randn(6, 6)) + 0.5
    y_np = rs.randn(6, 6)
    x, y = nps.array(x_np), nps.array(y_np)
    assert np.allclose(nps.sqrt(x).get(), np.sqrt(x_np))
    assert np.allclose(nps.exp(y).get(), np.exp(y_np))
    assert np.allclose(nps.log(x).get(), np.log(x_np))
    assert np.allclose(nps.add(x, y).get(), x_np + y_np)
    assert np.allclose(nps.maximum(x, y).get(), np.maximum(x_np, y_np))
    assert np.allclose(nps.hypot(x, y).get(), np.hypot(x_np, y_np))
    assert np.allclose(nps.arctan2(x, y).get(), np.arctan2(x_np, y_np))
    assert np.array_equal(nps.greater(x, y).get(), x_np > y_np)
    # scalar first arg
    assert np.allclose(nps.add(1.5, y).get(), 1.5 + y_np)


def test_matmul_tensordot():
    rs = np.random.RandomState(2)
    a_np = rs.randn(5, 4)
    b_np = rs.randn(4, 3)
    a, b = nps.array(a_np), nps.array(b_np)
    assert np.allclose(nps.matmul(a, b).get(), a_np @ b_np)
    assert np.allclose(nps.tensordot(a, b, axes=1).get(),
                       np.tensordot(a_np, b_np, axes=1))


def test_where_allclose():
    rs = np.random.RandomState(3)
    x_np = rs.randn(20)
    x = nps.array(x_np)
    idx = nps.where(x > 0)
    assert np.array_equal(idx[0].get(), np.where(x_np > 0)[0])
    w = nps.where(x > 0, x, -x)
    assert np.allclose(w.get(), np.abs(x_np))
    assert bool(nps.allclose(x, x + 1e-12))
    assert not bool(nps.allclose(x, x + 1.0))


def test_not_implemented_stub():
    # Every numpy callable is now implemented (coverage CLI: 0 stubs);
    # the _not_implemented fill mechanism remains for names future numpy
    # versions may add. Verify the mechanism itself.
    stub = nps._not_implemented(np.busday_count)
    assert stub._nums_tpu_stub
    with pytest.raises(NotImplementedError):
        stub("2026-01-01", "2026-02-01")
    # And the real busday_count works now.
    assert int(np.asarray(nps.busday_count("2026-01-01", "2026-02-01"))) == 22


def test_random_module():
    nps.random.seed(0)
    a = nps.random.rand(100)
    assert a.shape == (100,)
    assert (0 <= a.get()).all() and (a.get() < 1).all()
    b = nps.random.randn(10, 4)
    assert b.shape == (10, 4)
    c = nps.random.randint(0, 5, size=(50,))
    assert c.get().min() >= 0 and c.get().max() < 5
    p = nps.random.permutation(20)
    assert np.array_equal(np.sort(p.get()), np.arange(20))
    x = nps.arange(10)
    xp = nps.random.permutation(x)
    assert np.array_equal(np.sort(xp.get()), np.arange(10))


def test_linalg_module():
    rs = np.random.RandomState(4)
    x_np = rs.randn(100, 6)
    x = nps.array(x_np)
    q, r = nps.linalg.qr(x)
    assert np.allclose(q.get() @ r.get(), x_np, atol=1e-8)
    u, s, vt = nps.linalg.svd(x)
    assert np.allclose(u.get() @ np.diag(s.get()) @ vt.get(), x_np, atol=1e-8)
    spd = x_np.T @ x_np + np.eye(6)
    assert np.allclose(nps.linalg.inv(nps.array(spd)).get(),
                       np.linalg.inv(spd), atol=1e-8)


def test_loadtxt(tmp_path):
    rs = np.random.RandomState(5)
    arr = rs.randn(50, 4)
    path = str(tmp_path / "t.txt")
    np.savetxt(path, arr)
    ba = nps.loadtxt(path)
    assert np.allclose(ba.get(), arr, atol=1e-12)


def test_random_seed_determinism():
    nps.random.seed(123)
    a = nps.random.randn(50).get()
    nps.random.seed(123)
    b = nps.random.randn(50).get()
    assert np.array_equal(a, b)
    nps.random.seed(124)
    c = nps.random.randn(50).get()
    assert not np.array_equal(a, c)
    # sequential draws differ
    nps.random.seed(123)
    d1 = nps.random.randn(50).get()
    d2 = nps.random.randn(50).get()
    assert not np.array_equal(d1, d2)


def test_reshape_negative_one():
    """Advisor regression: reshape specs with -1 must be resolved before
    they reach the block-shape policy (previously produced a zero-block
    grid that silently broke write_fs / block_sgd / mesh sharding)."""
    x_np = np.arange(24, dtype=float)
    x = nps.array(x_np)
    y = nps.reshape(x, (-1, 2))
    assert y.shape == (12, 2)
    assert all(b > 0 for b in y.block_shape)
    assert y.grid.num_blocks >= 1
    assert np.allclose(y.get(), x_np.reshape(-1, 2))
    z = nps.reshape(nps.array(x_np.reshape(4, 6)), (3, -1))
    assert z.shape == (3, 8)
    assert np.allclose(z.get(), x_np.reshape(3, 8))
