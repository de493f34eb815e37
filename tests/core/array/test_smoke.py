import numpy as np


def test_creation_and_get(app_inst):
    ba = app_inst.zeros((40, 10), (10, 10), dtype=np.float64)
    assert ba.shape == (40, 10)
    assert ba.grid.grid_shape == (4, 1)
    assert np.allclose(ba.get(), np.zeros((40, 10)))
    ones = app_inst.ones((40, 10), (10, 10))
    assert np.allclose(ones.get(), np.ones((40, 10)))


def test_elementwise_and_matmul(app_inst):
    rs = np.random.RandomState(1337)
    x = rs.randn(64, 32)
    y = rs.randn(64, 32)
    bx = app_inst.array(x, block_shape=(16, 32))
    by = app_inst.array(y, block_shape=(16, 32))
    assert np.allclose((bx + by).get(), x + y)
    assert np.allclose((bx * 2 + 1).get(), x * 2 + 1)
    assert np.allclose((bx.T @ by).get(), x.T @ y)
    assert np.allclose(bx.sum(axis=0).get(), x.sum(axis=0))
    assert np.allclose(app_inst.mean(bx, axis=1).get(), x.mean(axis=1))


def test_scalar_and_bool(app_inst):
    s = app_inst.scalar(3.5)
    assert float(s) == 3.5
    x = app_inst.array(np.arange(10), block_shape=(4,))
    assert bool(app_inst.max(x) == 9)


def test_indexing(app_inst):
    rs = np.random.RandomState(7)
    x = rs.randn(20, 12)
    bx = app_inst.array(x, block_shape=(5, 6))
    assert np.allclose(bx[3:9].get(), x[3:9])
    assert np.allclose(bx[:, 2].get(), x[:, 2])
    assert np.allclose(bx[::2, ::-1].get(), x[::2, ::-1])
    bx[0:2] = 0.0
    x[0:2] = 0.0
    assert np.allclose(bx.get(), x)


def test_linalg_basics(app_inst):
    rs = np.random.RandomState(42)
    x = rs.randn(300, 8)
    bx = app_inst.array(x, block_shape=(75, 8))
    r = app_inst.indirect_tsr(bx).get()
    assert np.allclose(np.abs(r.T @ r), np.abs(x.T @ x), atol=1e-8)
    q, rr = app_inst.direct_tsqr(bx)
    assert np.allclose(q.get() @ rr.get(), x, atol=1e-8)
    u, s, vt = app_inst.svd(bx)
    assert np.allclose(
        u.get() @ np.diag(s.get()) @ vt.get(), x, atol=1e-8
    )
