"""Unary ufunc + structural op oracle tests (parity: reference test_basic_ops.py)."""

import numpy as np


UOPS_POSITIVE = ["sqrt", "log", "log2", "log10", "log1p"]
UOPS_GE1 = ["arccosh"]
UOPS_ANY = [
    "abs", "exp", "expm1", "sin", "cos", "tan", "sinh", "cosh", "tanh",
    "arctan", "arcsinh", "sign", "negative", "positive", "square", "ceil",
    "floor", "rint", "trunc", "cbrt", "deg2rad", "rad2deg", "isfinite",
    "isnan", "isinf",
]
UOPS_UNIT = ["arcsin", "arccos", "arctanh"]


def test_ufuncs_match_numpy(app_inst):
    rs = np.random.RandomState(0)
    x = rs.randn(16, 8) * 2
    bx = app_inst.array(x, block_shape=(4, 4))
    for op in UOPS_ANY:
        assert np.allclose(
            app_inst.map_uop(op, bx).get(), getattr(np, op)(x), equal_nan=True
        ), op
    xp = np.abs(x) + 0.1
    bxp = app_inst.array(xp, block_shape=(4, 4))
    for op in UOPS_POSITIVE:
        assert np.allclose(app_inst.map_uop(op, bxp).get(), getattr(np, op)(xp)), op
    xu = np.clip(x, -0.99, 0.99)
    bxu = app_inst.array(xu, block_shape=(4, 4))
    for op in UOPS_UNIT:
        assert np.allclose(app_inst.map_uop(op, bxu).get(), getattr(np, op)(xu)), op
    xg = np.abs(x) + 1.0
    bxg = app_inst.array(xg, block_shape=(4, 4))
    for op in UOPS_GE1:
        assert np.allclose(app_inst.map_uop(op, bxg).get(), getattr(np, op)(xg)), op


def test_astype_and_dtypes(app_inst):
    x = np.arange(20).reshape(4, 5)
    bx = app_inst.array(x, block_shape=(2, 5))
    assert bx.dtype == np.int64
    bf = bx.astype(np.float32)
    assert bf.dtype == np.float32
    assert np.allclose(bf.get(), x.astype(np.float32))
    bb = (bx > 10).astype(np.int64)
    assert np.array_equal(bb.get(), (x > 10).astype(np.int64))


def test_transpose_and_reshape_meta(app_inst):
    rs = np.random.RandomState(1)
    x = rs.randn(6, 4, 2)
    bx = app_inst.array(x, block_shape=(3, 2, 2))
    assert np.allclose(bx.transpose().get(), x.transpose())
    assert np.allclose(bx.transpose(1, 0, 2).get(), x.transpose(1, 0, 2))
    assert bx.transpose().block_shape == (2, 2, 3)
    assert np.allclose(bx.expand_dims(0).get(), x[None])
    y = rs.randn(5, 1, 3)
    by = app_inst.array(y, block_shape=(5, 1, 3))
    assert np.allclose(by.squeeze().get(), y.squeeze())


def test_xlogy_and_where(app_inst):
    rs = np.random.RandomState(2)
    x = np.abs(rs.randn(10, 4))
    y = np.abs(rs.randn(10, 4)) + 0.5
    bx = app_inst.array(x, block_shape=(5, 2))
    by = app_inst.array(y, block_shape=(5, 2))
    import scipy.special

    assert np.allclose(app_inst.xlogy(bx, by).get(), scipy.special.xlogy(x, y))
    cond = x > 0.5
    bcond = app_inst.array(cond, block_shape=(5, 2))
    assert np.allclose(
        app_inst.where(bcond, bx, by).get(), np.where(cond, x, y)
    )
    idx = app_inst.where(app_inst.array(cond[:, 0], block_shape=(5,)))
    assert np.array_equal(idx[0].get(), np.where(cond[:, 0])[0])


def test_allclose_and_touch(app_inst):
    x = np.ones((8, 8))
    bx = app_inst.array(x, block_shape=(4, 4))
    by = app_inst.array(x + 1e-12, block_shape=(4, 4))
    assert bool(app_inst.allclose(bx, by))
    assert not bool(app_inst.allclose(bx, bx + 1.0))
    assert bx.touch() is bx


def test_concatenate_split(app_inst):
    rs = np.random.RandomState(3)
    xs = [rs.randn(4, 6) for _ in range(3)]
    bas = [app_inst.array(x, block_shape=(2, 3)) for x in xs]
    cat = app_inst.concatenate(bas, axis=0)
    assert np.allclose(cat.get(), np.concatenate(xs, axis=0))
    cat1 = app_inst.concatenate(bas, axis=1, axis_block_size=4)
    assert np.allclose(cat1.get(), np.concatenate(xs, axis=1))
    parts = app_inst.split(cat, 3, axis=0)
    for p, x in zip(parts, xs):
        assert np.allclose(p.get(), x)


def test_diag_eye_arange_linspace(app_inst):
    v = np.arange(6).astype(float)
    bv = app_inst.array(v, block_shape=(3,))
    assert np.allclose(app_inst.diag(bv).get(), np.diag(v))
    m = app_inst.diag(bv)
    assert np.allclose(app_inst.diag(m).get(), v)
    assert np.allclose(
        app_inst.eye((5, 7), (5, 7)).get(), np.eye(5, 7)
    )
    assert np.array_equal(
        app_inst.arange((10,), (5,)).get(), np.arange(10)
    )
    assert np.allclose(
        app_inst.linspace(2.0, 3.0, (50,), (25,)).get(),
        np.linspace(2.0, 3.0, 50),
    )


def test_mean_var_std_int_promotion(app_inst):
    x = np.arange(24).reshape(6, 4)
    bx = app_inst.array(x, block_shape=(3, 2))
    assert np.allclose(app_inst.mean(bx).get(), x.mean())
    assert np.allclose(app_inst.var(bx, ddof=1).get(), x.var(ddof=1))
    assert np.allclose(app_inst.std(bx, axis=0).get(), x.std(axis=0))
    assert np.allclose(app_inst.sum(bx, axis=1, keepdims=True).get(),
                       x.sum(axis=1, keepdims=True))


def test_argops(app_inst):
    rs = np.random.RandomState(4)
    v = rs.randn(37)
    bv = app_inst.array(v, block_shape=(10,))
    assert int(app_inst.argmin(bv)) == int(np.argmin(v))
    assert int(app_inst.argmax(bv)) == int(np.argmax(v))


def test_broadcast_to_method(app_inst):
    x = np.arange(4).astype(float)
    bx = app_inst.array(x, block_shape=(2,))
    bb = bx.broadcast_to((3, 4))
    assert np.allclose(bb.get(), np.broadcast_to(x, (3, 4)))


def test_axis_tuple_and_list(app_inst):
    rs = np.random.RandomState(5)
    x = rs.randn(4, 5, 6)
    bx = app_inst.array(x, block_shape=(2, 5, 3))
    assert np.allclose(bx.sum(axis=(0, 2)).get(), x.sum(axis=(0, 2)))
    assert np.allclose(bx.sum(axis=[0, 2]).get(), x.sum(axis=(0, 2)))
    assert np.allclose(
        bx.mean(axis=[1], keepdims=True).get(), x.mean(axis=(1,), keepdims=True)
    )
    assert np.allclose(bx.std(axis=(0, 1)).get(), x.std(axis=(0, 1)))
