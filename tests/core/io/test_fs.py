"""Persistence + text-ingestion tests (parity: reference tests/test_api.py +
tests/core/storage/test_fs.py)."""

import os

import numpy as np
import pytest


def test_write_read_delete_fs(app_inst, tmp_path):
    rs = np.random.RandomState(0)
    x = rs.randn(40, 12)
    bx = app_inst.array(x, block_shape=(10, 6))
    path = str(tmp_path / "arr1")
    res = app_inst.write_fs(bx, path)
    assert res.all()
    back = app_inst.read_fs(path)
    assert back.shape == (40, 12)
    assert back.block_shape == (10, 6)
    assert np.allclose(back.get(), x)
    deleted = app_inst.delete_fs(path)
    assert deleted.all()
    assert not os.path.exists(path)


def test_checkpoint_restore_across_backends(tmp_path):
    """Sharding-aware restore: write under one backend, read under another
    (the mesh analogue of the reference's placement-aware re-read,
    application.py:164-171)."""
    from nums_tpu.core import settings, application_manager

    path = str(tmp_path / "xarr")
    x = np.arange(64, dtype=float).reshape(16, 4)

    settings.backend_name = "serial"
    application_manager.destroy()
    app = application_manager.instance()
    app.write_fs(app.array(x, block_shape=(4, 4)), path)

    settings.backend_name = "mesh"
    application_manager.destroy()
    app = application_manager.instance()
    back = app.read_fs(path)
    assert np.allclose(back.get(), x)
    application_manager.destroy()
    settings.backend_name = "serial"


def test_read_csv(app_inst, tmp_path):
    rs = np.random.RandomState(1)
    arr = rs.randn(500, 7)
    path = str(tmp_path / "data.csv")
    np.savetxt(path, arr, delimiter=",")
    ba = app_inst.read_csv(path, num_workers=4)
    assert ba.shape == (500, 7)
    assert np.allclose(ba.get(), arr, atol=1e-12)


def test_read_csv_header(app_inst, tmp_path):
    arr = np.arange(20).reshape(5, 4).astype(float)
    path = str(tmp_path / "h.csv")
    np.savetxt(path, arr, delimiter=",", header="a,b,c,d", comments="")
    ba = app_inst.read_csv(path, has_header=True, num_workers=2)
    assert ba.shape == (5, 4)
    assert np.allclose(ba.get(), arr)


def test_read_csv_fast_assembly_edge_cases(app_inst, tmp_path):
    """The round-4 zero-concat assembly (every range parses into its
    slice of one exact-size buffer): blank lines, trailing newline runs,
    a non-numeric file falling back to the loadtxt path, and bit-exact
    agreement with np.loadtxt."""
    rs = np.random.RandomState(3)
    arr = rs.randn(997, 5)  # odd row count: ragged last byte-range
    path = str(tmp_path / "gaps.csv")
    with open(path, "w") as f:
        for i, row in enumerate(arr):
            f.write(",".join("%.17g" % v for v in row) + "\n")
            if i % 250 == 0:
                f.write("\n")  # blank lines shrink the value count
        f.write("\n\n")
    host = app_inst.fs.read_csv_host(path, num_workers=6)
    assert host.shape == arr.shape
    assert np.array_equal(host, arr)  # %.17g round-trips bit-exact
    # Non-numeric content: the native path declines, loadtxt fallback
    # still yields the right values.
    path2 = str(tmp_path / "inf.csv")
    with open(path2, "w") as f:
        f.write("1,2,unparseable\n4,5,6\n")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        app_inst.fs.read_csv_host(path2, num_workers=2)
    # inf/nan ride the in-range strtod fallback inside the native path.
    path3 = str(tmp_path / "naninf.csv")
    with open(path3, "w") as f:
        f.write("1,inf,3\n-inf,nan,6\n")
    host3 = app_inst.fs.read_csv_host(path3, num_workers=1)
    assert np.isposinf(host3[0, 1]) and np.isneginf(host3[1, 0])
    assert np.isnan(host3[1, 1])


def test_loadtxt(app_inst, tmp_path):
    rs = np.random.RandomState(2)
    arr = rs.randn(100, 3)
    path = str(tmp_path / "data.txt")
    np.savetxt(path, arr)
    ba = app_inst.loadtxt(path)
    assert np.allclose(ba.get(), arr, atol=1e-12)


def test_api_verbs(app_inst, tmp_path):
    import nums_tpu
    from nums_tpu.core import application_manager

    application_manager.set_instance(app_inst)
    x = np.ones((10, 4))
    ba = app_inst.array(x, block_shape=(5, 2))
    path = str(tmp_path / "apiarr")
    nums_tpu.write(ba, path)
    back = nums_tpu.read(path)
    assert np.allclose(back.get(), x)
    nums_tpu.delete(path)
    assert not os.path.exists(path)


def test_s3_unavailable_raises(app_inst):
    import nums_tpu.core.io.filesystem as fsmod

    if fsmod._HAS_BOTO3:
        pytest.skip("boto3 present; S3 path exercised elsewhere")
    with pytest.raises(RuntimeError):
        app_inst.read_s3("bucket/key")


def test_sharded_restore_misaligned_blocks(tmp_path):
    """Stored blocks misaligned with the reader's shard regions: each
    shard must be assembled from partial block overlaps."""
    from nums_tpu.core import settings, application_manager

    path = str(tmp_path / "misaligned")
    rs = np.random.RandomState(0)
    x = rs.randn(16, 6)

    settings.backend_name = "serial"
    application_manager.destroy()
    app = application_manager.instance()
    app.write_fs(app.array(x, block_shape=(5, 3)), path)

    settings.backend_name = "mesh"
    application_manager.destroy()
    app = application_manager.instance()
    back = app.read_fs(path)
    assert np.allclose(back.get(), x)
    assert back.data.sharding.num_devices == 8
    application_manager.destroy()
    settings.backend_name = "serial"


def test_loadtxt_parallel_with_comments(app_inst, tmp_path):
    rs = np.random.RandomState(4)
    arr = rs.randn(300, 3)
    path = str(tmp_path / "c.txt")
    with open(path, "w") as f:
        f.write("# header comment\n")
        for i, row in enumerate(arr):
            if i % 50 == 0:
                f.write("# interior comment\n")
            f.write(" ".join(f"{v:.17g}" for v in row) + "\n")
    ba = app_inst.loadtxt(path, num_workers=4)
    assert ba.shape == (300, 3)
    assert np.allclose(ba.get(), arr, atol=1e-12)


def test_loadtxt_1d(app_inst, tmp_path):
    arr = np.arange(100).astype(float)
    path = str(tmp_path / "v.txt")
    np.savetxt(path, arr)
    ba = app_inst.loadtxt(path, num_workers=3)
    assert ba.shape == (100,)
    assert np.allclose(ba.get(), arr)


def test_loadtxt_fancy_args_fallback(app_inst, tmp_path):
    rs = np.random.RandomState(5)
    arr = rs.randn(40, 4)
    path = str(tmp_path / "f.txt")
    np.savetxt(path, arr)
    ba = app_inst.loadtxt(path, usecols=(1, 3), skiprows=2)
    assert np.allclose(ba.get(), arr[2:, [1, 3]], atol=1e-12)


def test_write_transposed_no_materialization(app_inst, tmp_path):
    """Persisting a lazily-transposed array must not materialize the
    transpose (block reads slice the raw buffer)."""
    rs = np.random.RandomState(9)
    x = rs.randn(12, 8)
    bx = app_inst.array(x, block_shape=(4, 4))
    t = bx.T
    path = str(tmp_path / "tarr")
    app_inst.write_fs(t, path)
    assert t.is_transposed  # write did NOT force materialization
    back = app_inst.read_fs(path)
    assert back.shape == (8, 12)
    assert np.allclose(back.get(), x.T)


def test_native_parser_rejects_ragged_rows(tmp_path):
    """Advisor regression: ragged rows must not silently parse as a clean
    rectangle (previously '1,2,3\\n4,5\\n6,7,8,9\\n' parsed as 3x3 with
    values shifted across rows)."""
    from nums_tpu.core.io import _native

    if _native.get_lib() is None:
        pytest.skip("no C compiler available")
    arr, ok = _native.parse_bytes(b"1,2,3\n4,5\n6,7,8,9\n", ",")
    assert not ok and arr is None
    # Clean input still parses natively.
    arr, ok = _native.parse_bytes(b"1,2,3\n4,5,6\n", ",")
    assert ok and arr.shape == (2, 3)
    assert np.allclose(arr, [[1, 2, 3], [4, 5, 6]])


def test_native_parser_fast_path_bit_exact():
    """The Clinger fast path (<=15 sig digits, |exp|<=22: one exact IEEE
    multiply) must be BIT-identical to strtod/np.loadtxt for every
    format the fast path accepts, and the >15-digit / huge-exponent
    fallback must stay correctly rounded."""
    import io

    from nums_tpu.core.io import _native

    if _native.get_lib() is None:
        pytest.skip("no C compiler available")
    rs = np.random.RandomState(11)
    vals = np.concatenate([
        rs.randn(500),                 # ~unit scale
        rs.randn(500) * 1e-30,         # falls outside the exact window
        rs.randn(500) * 1e30,
        np.array([0.0, -0.0, 1.0, -1.0, 1e-322,     # subnormal
                  1.7976931348623157e308,           # DBL_MAX
                  123456.789e-10, 5e-324]),
    ])
    for fmt in ("%.6g", "%.17g", "%.9e", "%.3f", "%.1f"):
        txt = "\n".join(
            ",".join(fmt % v for v in vals[i:i + 4])
            for i in range(0, len(vals) // 4 * 4, 4)
        )
        arr, ok = _native.parse_bytes(txt.encode(), ",")
        assert ok, fmt
        oracle = np.loadtxt(io.StringIO(txt), delimiter=",", ndmin=2)
        assert np.array_equal(arr, oracle), fmt  # bit-exact, not close
    # inf/nan route through the strtod fallback.
    arr, ok = _native.parse_bytes(b"inf,-inf,nan\n1,2,3\n", ",")
    assert ok and np.isposinf(arr[0, 0]) and np.isneginf(arr[0, 1])
    assert np.isnan(arr[0, 2])
