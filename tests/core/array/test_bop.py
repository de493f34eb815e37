"""Binary-op + tensordot oracle tests (parity: reference tests/core/array/test_bop.py)."""

import itertools

import numpy as np
import pytest


def test_elementwise_binary(app_inst):
    rs = np.random.RandomState(0)
    x = rs.randn(24, 16)
    y = rs.randn(24, 16)
    bx = app_inst.array(x, block_shape=(8, 8))
    by = app_inst.array(y, block_shape=(8, 8))
    for op in ["add", "subtract", "multiply", "true_divide"]:
        z = app_inst.map_bop(op, bx, by).get()
        assert np.allclose(z, getattr(np, op)(x, y)), op
    # power with positive base (negative base ** fractional is nan).
    bxp = app_inst.array(np.abs(x), block_shape=(8, 8))
    assert np.allclose(
        app_inst.map_bop("power", bxp, by).get(), np.power(np.abs(x), y)
    )


def test_broadcasting(app_inst):
    rs = np.random.RandomState(1)
    x = rs.randn(20, 12)
    v_row = rs.randn(12)
    v_col = rs.randn(20, 1)
    bx = app_inst.array(x, block_shape=(5, 6))
    bvr = app_inst.array(v_row, block_shape=(6,))
    bvc = app_inst.array(v_col, block_shape=(5, 1))
    assert np.allclose((bx + bvr).get(), x + v_row)
    assert np.allclose((bx * bvc).get(), x * v_col)
    assert np.allclose((bvr + bvc).get(), v_row + v_col)
    # scalar broadcasting, both sides
    assert np.allclose((bx - 3).get(), x - 3)
    assert np.allclose((3 - bx).get(), 3 - x)
    assert np.allclose((2.0 ** app_inst.array(np.abs(x), (5, 6))).get(), 2.0 ** np.abs(x))


@pytest.mark.parametrize("bs_a,bs_b", [
    ((10, 7), (7, 4)),
    ((5, 3), (3, 9)),
    ((30, 21), (21, 12)),
])
def test_matmul_block_shapes(app_inst, bs_a, bs_b):
    rs = np.random.RandomState(2)
    a = rs.randn(30, 21)
    b = rs.randn(21, 12)
    ba = app_inst.array(a, block_shape=bs_a)
    bb = app_inst.array(b, block_shape=bs_b)
    assert np.allclose((ba @ bb).get(), a @ b)


def test_tensordot_axes(app_inst):
    rs = np.random.RandomState(3)
    a = rs.randn(4, 5, 6)
    b = rs.randn(5, 6, 3)
    ba = app_inst.array(a, block_shape=(2, 5, 3))
    bb = app_inst.array(b, block_shape=(5, 3, 3))
    assert np.allclose(ba.tensordot(bb, axes=2).get(), np.tensordot(a, b, axes=2))
    c = rs.randn(6, 7)
    bc = app_inst.array(c, block_shape=(3, 7))
    assert np.allclose(ba.tensordot(bc, axes=1).get(), np.tensordot(a, c, axes=1))
    assert np.allclose(
        ba.tensordot(bb, axes=0).get().shape, np.tensordot(a, b, axes=0).shape
    )


def test_vecdot_matvec(app_inst):
    rs = np.random.RandomState(4)
    m = rs.randn(16, 10)
    v = rs.randn(10)
    w = rs.randn(16)
    bm = app_inst.array(m, block_shape=(4, 5))
    bv = app_inst.array(v, block_shape=(5,))
    bw = app_inst.array(w, block_shape=(4,))
    assert np.allclose((bm @ bv).get(), m @ v)
    assert np.allclose((bw @ bm).get(), w @ m)
    assert np.allclose((bv @ bv).get(), v @ v)
    assert np.allclose((bm.T @ bm).get(), m.T @ m)


def test_transposed_operand(app_inst):
    rs = np.random.RandomState(5)
    a = rs.randn(12, 8)
    b = rs.randn(12, 8)
    ba = app_inst.array(a, block_shape=(4, 4))
    bb = app_inst.array(b, block_shape=(4, 4))
    assert np.allclose((ba.T @ bb).get(), a.T @ b)
    assert np.allclose((ba @ bb.T).get(), a @ b.T)
    assert np.allclose(ba.T.T.get(), a)


def test_inequalities_and_logic(app_inst):
    rs = np.random.RandomState(6)
    x = rs.randn(10, 10)
    y = rs.randn(10, 10)
    bx = app_inst.array(x, block_shape=(5, 5))
    by = app_inst.array(y, block_shape=(5, 5))
    for op in ["__lt__", "__le__", "__gt__", "__ge__", "__eq__", "__ne__"]:
        assert np.array_equal(
            getattr(bx, op)(by).get(), getattr(x, op)(y)
        ), op
        assert np.array_equal(getattr(bx, op)(0.5).get(), getattr(x, op)(0.5)), op
    m1 = bx > 0
    m2 = by > 0
    assert np.array_equal((m1 & m2).get(), (x > 0) & (y > 0))
    assert np.array_equal((m1 | m2).get(), (x > 0) | (y > 0))
    assert np.array_equal((m1 ^ m2).get(), (x > 0) ^ (y > 0))
    assert np.array_equal((~m1).get(), ~(x > 0))


def test_int_ops(app_inst):
    x = np.arange(-12, 12).reshape(6, 4)
    y = np.arange(1, 25).reshape(6, 4)
    bx = app_inst.array(x, block_shape=(3, 2))
    by = app_inst.array(y, block_shape=(3, 2))
    assert np.array_equal((bx % by).get(), x % y)
    assert np.array_equal((bx // by).get(), x // y)
    assert np.array_equal((bx << 2).get(), x << 2)
    assert np.array_equal((bx >> 1).get(), x >> 1)


def test_block_integrity_after_ops(app_inst):
    from tests.core.array.common import check_block_integrity

    rs = np.random.RandomState(10)
    a = rs.randn(12, 10)
    b = rs.randn(10, 6)
    ba = app_inst.array(a, block_shape=(5, 4))
    bb = app_inst.array(b, block_shape=(4, 3))
    check_block_integrity(ba)
    check_block_integrity(ba + 1.0)
    check_block_integrity(ba.T)
    check_block_integrity(ba @ bb)
    check_block_integrity(ba.sum(axis=0))
    check_block_integrity(ba.reshape(10, 12, block_shape=(3, 5)))
    check_block_integrity(ba[1:9, ::2])
