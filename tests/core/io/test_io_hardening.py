"""Round-5 I/O hardening regressions: orphan lifecycle, live-writer
protection, loadtxt/read_csv edge semantics, S3 delete chunking."""

import os
import shutil

import numpy as np
import pytest


def test_mp_style_tmp0_orphan_is_cleaned(app_inst, tmp_path):
    """The multi-process writer's deterministic '.tmp-0' suffix must be
    swept as an orphan: a crashed multi-host write followed by
    delete_fs must not leak the dir or let a later read resurrect the
    deleted checkpoint (round-4 suffix '.tmp-mp' matched neither the
    cleanup regex nor pid-liveness and did both)."""
    p = str(tmp_path / "arr")
    x = np.arange(8, dtype=float)
    app_inst.write_fs(app_inst.array(x, block_shape=(4,)), p)
    # Simulate a crashed mp write that got as far as meta (complete).
    shutil.copytree(p, f"{p}.tmp-0")
    app_inst.delete_fs(p)
    assert not os.path.isdir(f"{p}.tmp-0")
    assert not app_inst.fs.exists_fs(p)  # no resurrection


def test_live_writer_tmp_survives_cleanup(app_inst, tmp_path):
    """A '.tmp-<pid>' belonging to a LIVE process (a concurrent writer
    mid-write) must not be swept by another writer's post-publish
    cleanup. pid 1 (init) stands in for the live peer."""
    from nums_tpu.core.io import filesystem as fsmod

    p = str(tmp_path / "arr2")
    x = np.arange(8, dtype=float)
    app_inst.write_fs(app_inst.array(x, block_shape=(4,)), p)
    live = f"{p}.tmp-1"
    os.makedirs(live)
    fsmod._cleanup_orphans(p)
    assert os.path.isdir(live)  # live writer protected
    # A dead pid's orphan (impossible pid) goes.
    dead = f"{p}.tmp-4999999"
    os.makedirs(dead)
    fsmod._cleanup_orphans(p)
    assert not os.path.isdir(dead)
    shutil.rmtree(live)
    app_inst.delete_fs(p)


def test_loadtxt_single_row_squeezes(app_inst, tmp_path):
    path = str(tmp_path / "one_row.txt")
    with open(path, "w") as f:
        f.write("1 2 3\n")
    got = app_inst.loadtxt(path).get()
    want = np.loadtxt(path)
    assert got.shape == want.shape == (3,)
    assert np.allclose(got, want)


def test_loadtxt_empty_file_raises(app_inst, tmp_path):
    path = str(tmp_path / "empty.txt")
    open(path, "w").close()
    with pytest.raises(ValueError, match="no data"):
        app_inst.loadtxt(path)


def test_read_csv_blank_file_raises(app_inst, tmp_path):
    path = str(tmp_path / "blank.csv")
    with open(path, "w") as f:
        f.write("\n\n")
    with pytest.raises(ValueError, match="no data"):
        app_inst.read_csv(path)


def test_delete_s3_chunks_requests(app_inst, tmp_path, monkeypatch):
    """DeleteObjects is capped at 1000 keys per request on real S3; the
    in-process fake accepts any count, so assert the chunking itself."""
    monkeypatch.setenv("NUMS_TPU_FAKE_S3_DIR", "")
    monkeypatch.setenv("NUMS_TPU_FAKE_S3", "1")
    client = app_inst.fs._s3_client()
    client.create_bucket("bkt")
    # 1001 block objects + meta via the normal write path would be slow;
    # wrap delete_objects and drive delete_s3 against a synthetic grid.
    x = np.arange(12, dtype=float).reshape(12, 1)
    app_inst.write_s3(app_inst.array(x, block_shape=(1, 1)), "bkt/arr")
    calls = []
    orig = client.delete_objects

    def spy(Bucket, Delete):
        calls.append(len(Delete["Objects"]))
        return orig(Bucket=Bucket, Delete=Delete)

    monkeypatch.setattr(client, "delete_objects", spy)
    monkeypatch.setattr(
        "nums_tpu.core.io.filesystem.FileSystem._s3_client",
        lambda self: client,
    )
    app_inst.delete_s3("bkt/arr")
    assert calls and all(c <= 1000 for c in calls)
    assert sum(calls) == 13  # 12 blocks + meta
