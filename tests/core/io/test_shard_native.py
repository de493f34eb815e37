"""Native C++ shard-I/O engine (io/shard_io.cpp + shard_native.py).

Contract: byte-identical .npy format with the np.save fallback (files
are interchangeable), window reads fetch exactly the requested region,
and FileSystem round-trips through the native path.
"""

import numpy as np
import pytest

from nums_tpu.core.io import shard_native


pytestmark = pytest.mark.skipif(
    shard_native.get_lib() is None, reason="no C++ compiler available"
)


def test_write_shards_npy_compatible(tmp_path):
    rs = np.random.RandomState(0)
    arrays = [
        rs.randn(5, 3),
        np.arange(7, dtype=np.int32),
        rs.randn(2, 2).astype(np.float32),
        np.zeros((0, 4)),
    ]
    items = [(str(tmp_path / f"b{i}.npy"), a) for i, a in enumerate(arrays)]
    assert shard_native.write_shards(items)
    for (p, a) in items:
        back = np.load(p)
        assert back.dtype == a.dtype and back.shape == a.shape
        assert np.array_equal(back, a)


def test_write_matches_np_save_bytes(tmp_path):
    a = np.arange(24, dtype=np.float64).reshape(4, 6)
    p_native = str(tmp_path / "native.npy")
    p_np = str(tmp_path / "numpy.npy")
    assert shard_native.write_shards([(p_native, a)])
    np.save(p_np, a)
    assert open(p_native, "rb").read() == open(p_np, "rb").read()


def test_read_block_windows_2d(tmp_path):
    rs = np.random.RandomState(1)
    b0 = rs.randn(6, 8)
    b1 = rs.randn(6, 8)
    p0, p1 = str(tmp_path / "b0.npy"), str(tmp_path / "b1.npy")
    np.save(p0, b0)  # native must read np.save-written files too
    assert shard_native.write_shards([(p1, b1)])
    out = np.zeros((7, 5))
    jobs = [
        (p0, (slice(1, 4), slice(2, 7)), (slice(0, 3), slice(0, 5))),
        (p1, (slice(2, 6), slice(0, 5)), (slice(3, 7), slice(0, 5))),
    ]
    assert shard_native.read_block_windows(jobs, out)
    expect = np.zeros((7, 5))
    expect[0:3, 0:5] = b0[1:4, 2:7]
    expect[3:7, 0:5] = b1[2:6, 0:5]
    assert np.array_equal(out, expect)


def test_read_block_windows_1d(tmp_path):
    v = np.arange(100, dtype=np.float64)
    p = str(tmp_path / "v.npy")
    assert shard_native.write_shards([(p, v)])
    out = np.zeros(10)
    assert shard_native.read_block_windows(
        [(p, (slice(40, 50),), (slice(0, 10),))], out
    )
    assert np.array_equal(out, v[40:50])


def test_read_fallback_on_mismatch(tmp_path):
    """dtype / ndim mismatches must be REFUSED (return False), never
    silently read wrong bytes."""
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = str(tmp_path / "a.npy")
    np.save(p, a)
    out64 = np.zeros((3, 4))  # float64 != stored float32
    assert not shard_native.read_block_windows(
        [(p, (slice(0, 3), slice(0, 4)), (slice(0, 3), slice(0, 4)))], out64
    )
    out1d = np.zeros(12)
    assert not shard_native.read_block_windows(
        [(p, (slice(0, 12),), (slice(0, 12),))], out1d
    )


def test_filesystem_roundtrip_uses_native(app_inst, tmp_path):
    rs = np.random.RandomState(2)
    x = rs.randn(64, 12)
    bx = app_inst.array(x, block_shape=(16, 6))
    p = str(tmp_path / "arr")
    app_inst.write_fs(bx, p)
    # blocks on disk are plain .npy regardless of writer path
    import os
    files = sorted(os.listdir(p))
    assert "meta.pkl" in files and any(f.endswith(".npy") for f in files)
    back = app_inst.read_fs(p)
    assert np.allclose(back.get(), x)
    app_inst.delete_fs(p)
