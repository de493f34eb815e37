"""Oracle tests for the terminal facade tranche (nums_tpu.numpy.tail) —
the last numpy callables, previously ``_not_implemented`` stubs."""

import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _use_app(nps_app_inst):
    yield


import nums_tpu.numpy as nps  # noqa: E402
from nums_tpu.core.array.blockarray import BlockArray  # noqa: E402


def test_bitwise_count():
    x_np = np.array([[0, 1, 255, 1023], [7, -8, 12345, 2**30]], dtype=np.int32)
    out = nps.bitwise_count(nps.array(x_np))
    assert np.array_equal(out.get(), np.bitwise_count(x_np))


def test_from_dlpack():
    x_np = np.arange(24, dtype=np.float32).reshape(4, 6)
    out = nps.from_dlpack(x_np)
    assert isinstance(out, BlockArray)
    assert np.array_equal(out.get(), np.from_dlpack(x_np))


def test_require():
    x_np = np.arange(6.0).reshape(2, 3)
    out = nps.require(nps.array(x_np), dtype=np.float32, requirements=["C"])
    assert out.get().dtype == np.float32
    assert np.allclose(out.get(), x_np)


def test_ix_():
    a_np = np.arange(30).reshape(5, 6)
    rows, cols = np.array([0, 3, 4]), np.array([1, 5])
    got = nps.ix_(nps.array(rows), cols)
    want = np.ix_(rows, cols)
    for g, w in zip(got, want):
        assert g.shape == w.shape
        assert np.array_equal(g.get(), w)
    # Boolean selector variant.
    mask = np.array([True, False, True, False, True])
    got_b = nps.ix_(mask, cols)
    want_b = np.ix_(mask, cols)
    for g, w in zip(got_b, want_b):
        assert np.array_equal(g.get(), w)
    # Round-trip through real indexing on the oracle.
    assert np.array_equal(
        a_np[np.ix_(rows, cols)], a_np[tuple(np.asarray(g.get()) for g in got)]
    )


def test_piecewise():
    x_np = np.linspace(-2.5, 2.5, 11)
    x = nps.array(x_np)
    out = nps.piecewise(
        x, [x < 0, x >= 0], [lambda v: -v, lambda v: v**2]
    )
    want = np.piecewise(
        x_np, [x_np < 0, x_np >= 0], [lambda v: -v, lambda v: v**2]
    )
    assert np.allclose(out.get(), want)
    # Default (len(funclist) == len(condlist)+1) and scalar funcs.
    out2 = nps.piecewise(x, [x < -1, x > 1], [-1.0, 1.0, 0.0])
    want2 = np.piecewise(x_np, [x_np < -1, x_np > 1], [-1.0, 1.0, 0.0])
    assert np.allclose(out2.get(), want2)


def test_apply_over_axes():
    x_np = np.arange(24.0).reshape(2, 3, 4)
    x = nps.array(x_np)
    out = nps.apply_over_axes(nps.sum, x, [0, 2])
    want = np.apply_over_axes(np.sum, x_np, [0, 2])
    assert out.shape == want.shape
    assert np.allclose(out.get(), want)


def test_bmat():
    a = np.arange(4.0).reshape(2, 2)
    b = np.ones((2, 3))
    c = np.zeros((1, 2))
    d = np.full((1, 3), 7.0)
    got = nps.bmat([[nps.array(a), nps.array(b)], [nps.array(c), nps.array(d)]])
    want = np.asarray(np.bmat([[a, b], [c, d]]))
    assert np.array_equal(got.get(), want)
    # String syntax against caller locals.
    A, B = nps.array(a), nps.array(b[:, :2])  # noqa: N806
    got_s = nps.bmat("A B; B A")
    b2 = b[:, :2]
    want_s = np.asarray(
        np.bmat("a b2; b2 a", {"a": a, "b2": b2}, {"a": a, "b2": b2})
    )
    assert np.array_equal(got_s.get(), want_s)


def test_busday_and_datetime():
    assert nps.is_busday("2026-08-14")  # a Friday
    assert not nps.is_busday("2026-08-16")  # a Sunday
    cnt = nps.busday_count("2026-08-01", "2026-08-16")
    assert int(np.asarray(cnt)) == np.busday_count("2026-08-01", "2026-08-16")
    off = nps.busday_offset("2026-08-16", 1, roll="forward")
    assert off == np.busday_offset("2026-08-16", 1, roll="forward")
    d = np.array(["2026-08-16", "NaT"], dtype="datetime64[D]")
    nat = nps.isnat(d)
    got = nat.get() if isinstance(nat, BlockArray) else np.asarray(nat)
    assert np.array_equal(got, np.isnat(d))
    assert list(nps.datetime_as_string(d)) == list(np.datetime_as_string(d))
    assert nps.datetime_data(d.dtype) == np.datetime_data(d.dtype)


def test_errcall_passthrough():
    prev = nps.geterrcall()
    called = []
    nps.seterrcall(lambda err, flag: called.append(err))
    try:
        assert np.geterrcall() is not None
    finally:
        np.seterrcall(prev)


def test_asmatrix_and_nested_iters():
    a_np = np.arange(6.0).reshape(2, 3)
    m = nps.asmatrix(nps.array(a_np))
    assert isinstance(m, np.matrix)
    assert np.array_equal(np.asarray(m), a_np)
    i, j = nps.nested_iters(nps.array(a_np), [[0], [1]])
    total = 0.0
    for _ in i:
        for v in j:
            total += float(v)
    assert total == a_np.sum()


def test_file_readers(tmp_path):
    # fromfile (binary)
    raw = np.arange(10, dtype=np.float32)
    fpath = os.path.join(tmp_path, "raw.bin")
    raw.tofile(fpath)
    out = nps.fromfile(fpath, dtype=np.float32)
    assert np.array_equal(out.get(), raw)
    # fromregex
    tpath = os.path.join(tmp_path, "vals.txt")
    with open(tpath, "w") as f:
        f.write("a=1.5\nb=2.5\nc=-3.0\n")
    got = nps.fromregex(tpath, r"=(\S+)", [("v", np.float64)])
    want = np.fromregex(tpath, r"=(\S+)", [("v", np.float64)])
    assert np.array_equal(np.asarray(got["v"]), np.asarray(want["v"]))
    # genfromtxt
    cpath = os.path.join(tmp_path, "table.csv")
    with open(cpath, "w") as f:
        f.write("1.0,2.0\n3.0,4.0\n")
    out2 = nps.genfromtxt(cpath, delimiter=",")
    assert np.array_equal(out2.get(), np.genfromtxt(cpath, delimiter=","))


def test_savez_compressed(tmp_path):
    a_np = np.arange(8.0).reshape(2, 4)
    zpath = os.path.join(tmp_path, "ar.npz")
    nps.savez_compressed(zpath, x=nps.array(a_np), y=a_np * 2)
    with np.load(zpath) as z:
        assert np.array_equal(z["x"], a_np)
        assert np.array_equal(z["y"], a_np * 2)


def test_coverage_is_stub_free():
    """The whole numpy module surface is now implemented or a documented
    host fallback — 0 stubs (this test is the regression gate)."""
    from nums_tpu.cmds.api_coverage import _module_coverage

    _, _, stubs, missing = _module_coverage(np, nps)
    assert stubs == []
    assert missing == []
