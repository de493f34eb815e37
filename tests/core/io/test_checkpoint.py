"""Crash-consistent writes + versioned recovery (the reference's TODO
subsystem: journaling/idempotency, filesystem.py:217-222 there)."""

import os
import pickle
import shutil

import numpy as np
import pytest

from nums_tpu.core.io import checkpoint


def test_write_fs_is_atomic(app_inst, tmp_path):
    """A reader never sees a half-written checkpoint: meta.pkl exists
    only in fully-published directories, and an interrupted write leaves
    the PREVIOUS version intact."""
    p = str(tmp_path / "arr")
    x1 = np.arange(12, dtype=float).reshape(3, 4)
    app_inst.write_fs(app_inst.array(x1, block_shape=(3, 4)), p)
    # Simulate a crash mid-write of version 2: a .tmp dir with blocks
    # but NO meta.pkl (meta is written last).
    tmp_dir = f"{p}.tmp-99999"
    os.makedirs(tmp_dir)
    np.save(os.path.join(tmp_dir, "block_0_0.npy"), x1 * 2)
    # Reader still gets version 1.
    assert np.allclose(app_inst.read_fs(p).get(), x1)
    shutil.rmtree(tmp_dir)
    # A successful overwrite replaces atomically.
    x2 = x1 * 10
    app_inst.write_fs(app_inst.array(x2, block_shape=(3, 2)), p)
    assert np.allclose(app_inst.read_fs(p).get(), x2)
    app_inst.delete_fs(p)


def test_versioned_checkpoint_roundtrip(app_inst, tmp_path):
    name = str(tmp_path / "ckpt")
    rs = np.random.RandomState(0)
    arrays = [rs.randn(8, 4) for _ in range(4)]
    for i, a in enumerate(arrays):
        checkpoint.save(
            app_inst.array(a, block_shape=(4, 4)), name, step=i, keep=2
        )
    # pruning keeps the newest two
    assert checkpoint.steps(name) == [2, 3]
    step, back = checkpoint.restore_latest(name)
    assert step == 3 and np.allclose(back.get(), arrays[3])
    assert checkpoint.resume_step(name) == 4
    checkpoint.delete(name)
    assert checkpoint.steps(name) == []
    assert checkpoint.resume_step(name, default=7) == 7


def test_restore_skips_torn_checkpoint(app_inst, tmp_path):
    """Elastic recovery: a corrupted newest version falls back to the
    previous complete one."""
    name = str(tmp_path / "ckpt2")
    rs = np.random.RandomState(1)
    good = rs.randn(6, 3)
    checkpoint.save(app_inst.array(good, block_shape=(3, 3)), name, step=0)
    checkpoint.save(app_inst.array(good * 2, block_shape=(3, 3)), name,
                    step=1)
    # Corrupt step 1: valid meta but a destroyed block file.
    step1 = os.path.join(name, "step_1")
    blocks = [f for f in os.listdir(step1) if f.endswith(".npy")]
    with open(os.path.join(step1, blocks[0]), "wb") as f:
        f.write(b"garbage")
    step, back = checkpoint.restore_latest(name)
    assert step == 0
    assert np.allclose(back.get(), good)
    # Fully unrestorable -> FileNotFoundError
    with open(os.path.join(name, "step_0", "meta.pkl"), "wb") as f:
        pickle.dump({"not": "a grid"}, f)
    with pytest.raises(FileNotFoundError):
        checkpoint.restore_latest(name)
    checkpoint.delete(name)
