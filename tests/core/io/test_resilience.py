"""Fault-injection tests for checkpoint replication, CRC integrity, and
self-healing scrub — the replication/journaling subsystem the reference
lists as absent TODOs (``nums/core/systems/filesystem.py:217-222``)."""

import os

import numpy as np

from nums_tpu.core.io import checkpoint


def _block_path(root, entry=(0, 0)):
    return os.path.join(root, "block_" + "_".join(map(str, entry)) + ".npy")


def test_replicated_write_survives_lost_primary_block(app_inst, tmp_path):
    p = str(tmp_path / "arr")
    x = np.arange(24, dtype=float).reshape(6, 4)
    ba = app_inst.array(x, block_shape=(3, 2))
    app_inst.write_fs(ba, p, replicas=2)
    assert os.path.isfile(os.path.join(p + ".replica1", "meta.pkl"))
    # Lose one primary block file entirely.
    os.remove(_block_path(p, (1, 1)))
    back = app_inst.read_fs(p)
    assert np.allclose(back.get(), x)
    app_inst.delete_fs(p)
    assert not os.path.isdir(p + ".replica1")


def test_verify_detects_and_repairs_silent_corruption(app_inst, tmp_path):
    p = str(tmp_path / "arr2")
    rs = np.random.RandomState(0)
    x = rs.randn(8, 4)
    app_inst.write_fs(app_inst.array(x, block_shape=(4, 4)), p, replicas=2)
    # Silent bit corruption: same shape/dtype, different values — np.load
    # succeeds, only the CRC knows. (np.save writes exactly to .npy paths.)
    np.save(_block_path(p, (1, 0)), rs.randn(4, 4))
    report = app_inst.verify_fs(p)
    assert not report["ok"]
    assert (p, "block_1_0.npy") in report["bad"]
    assert not report["unrecoverable"]
    # verify=True restore routes around the corrupt primary copy.
    assert np.allclose(app_inst.read_fs(p, verify=True).get(), x)
    # Self-heal, then the scrub comes back clean.
    report = app_inst.verify_fs(p, repair=True)
    assert report["repaired"] == [(p, "block_1_0.npy")]
    assert app_inst.verify_fs(p)["ok"]
    assert np.allclose(app_inst.read_fs(p).get(), x)
    app_inst.delete_fs(p)


def test_unrecoverable_when_all_copies_corrupt(app_inst, tmp_path):
    p = str(tmp_path / "arr3")
    x = np.arange(16, dtype=float).reshape(4, 4)
    app_inst.write_fs(app_inst.array(x, block_shape=(2, 4)), p, replicas=2)
    for d in (p, p + ".replica1"):
        np.save(_block_path(d, (0, 0)), np.zeros((2, 4)))
    report = app_inst.verify_fs(p)
    assert report["unrecoverable"] == ["block_0_0.npy"]
    try:
        app_inst.read_fs(p, verify=True).get()
        raised = False
    except Exception:
        raised = True
    assert raised
    app_inst.delete_fs(p)


def test_overwrite_drops_stale_replicas(app_inst, tmp_path):
    p = str(tmp_path / "arr4")
    x = np.arange(8, dtype=float)
    app_inst.write_fs(app_inst.array(x, block_shape=(4,)), p, replicas=2)
    assert os.path.isdir(p + ".replica1")
    # Rewrite unreplicated: the old replica must not serve stale blocks.
    app_inst.write_fs(app_inst.array(x * 10, block_shape=(4,)), p)
    assert not os.path.isdir(p + ".replica1")
    assert np.allclose(app_inst.read_fs(p).get(), x * 10)
    app_inst.delete_fs(p)


def test_torn_primary_meta_fails_over_to_replica(app_inst, tmp_path):
    p = str(tmp_path / "arr5")
    x = np.arange(12, dtype=float).reshape(3, 4)
    app_inst.write_fs(app_inst.array(x, block_shape=(3, 2)), p, replicas=2)
    os.remove(os.path.join(p, "meta.pkl"))
    assert np.allclose(app_inst.read_fs(p, verify=True).get(), x)
    app_inst.delete_fs(p)


def test_checkpoint_replicas_and_journal(app_inst, tmp_path):
    name = str(tmp_path / "ckpt")
    rs = np.random.RandomState(2)
    a0, a1 = rs.randn(6, 3), rs.randn(6, 3)
    checkpoint.save(app_inst.array(a0, block_shape=(3, 3)), name, step=0,
                    replicas=2)
    checkpoint.save(app_inst.array(a1, block_shape=(3, 3)), name, step=1,
                    keep=1, replicas=2)
    # Corrupt a block of the newest step; verified restore self-routes.
    step_dir = os.path.join(name, "step_1")
    np.save(_block_path(step_dir, (0, 0)), np.zeros((3, 3)))
    step, back = checkpoint.restore_latest(name, verify=True)
    assert step == 1 and np.allclose(back.get(), a1)
    events = [(e, s) for _, e, s in checkpoint.journal(name)]
    assert ("begin", 0) in events and ("commit", 0) in events
    assert ("commit", 1) in events
    assert ("prune", 0) in events
    assert ("restore", 1) in events
    checkpoint.delete(name)


def test_torn_publish_promotes_orphan(app_inst, tmp_path):
    """Crash between the two publish renames (final gone, complete .tmp
    and .old both present): readers promote the newest complete tmp —
    the version that was being published."""
    p = str(tmp_path / "arr6")
    x1 = np.arange(8, dtype=float)
    x2 = x1 * 7
    app_inst.write_fs(app_inst.array(x1, block_shape=(4,)), p)
    staging = str(tmp_path / "staging")
    app_inst.write_fs(app_inst.array(x2, block_shape=(4,)), staging)
    os.rename(p, p + ".old-111")      # simulate: final renamed away...
    os.rename(staging, p + ".tmp-222")  # ...new version stuck in tmp
    assert app_inst.fs.exists_fs(p)   # recovery-aware existence
    assert np.allclose(app_inst.read_fs(p).get(), x2)
    # The checkpoint is a normal directory again; delete clears orphans.
    app_inst.delete_fs(p)
    assert not app_inst.fs.exists_fs(p)
    assert not os.path.isdir(p + ".old-111")


def test_torn_step_visible_to_checkpoint_walk(app_inst, tmp_path):
    name = str(tmp_path / "ckpt2")
    a = np.arange(6, dtype=float).reshape(2, 3)
    checkpoint.save(app_inst.array(a, block_shape=(2, 3)), name, step=5)
    step_dir = os.path.join(name, "step_5")
    os.rename(step_dir, step_dir + ".old-9")  # torn publish of step 5
    assert checkpoint.steps(name) == [5]      # recovered, not invisible
    step, back = checkpoint.restore_latest(name)
    assert step == 5 and np.allclose(back.get(), a)
    checkpoint.delete(name)


def test_hypergeometric_validates_nsample(app_inst):
    rs = app_inst.random_state(0)
    try:
        rs.hypergeometric(2, 2, 10, shape=(4,), block_shape=(4,))
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_replica_dirs_no_basename_collision(app_inst, tmp_path):
    """Two checkpoints sharing a final path component (every model's
    step_<k>) must NOT share replica directories under
    NUMS_TPU_REPLICA_DIRS (review finding: basename-keyed replicas let
    another model's data splice in on failover)."""
    from nums_tpu.core import settings

    root = str(tmp_path / "replicaroot")
    old = settings.replica_roots
    settings.replica_roots = [root]
    try:
        a = np.arange(8, dtype=float)
        b = a * 100.0
        pa, pb = str(tmp_path / "modelA" / "ckpt"), str(
            tmp_path / "modelB" / "ckpt")
        app_inst.write_fs(app_inst.array(a, block_shape=(4,)), pa,
                          replicas=2)
        app_inst.write_fs(app_inst.array(b, block_shape=(4,)), pb,
                          replicas=2)
        # Lose a primary block of A: failover must return A's data.
        os.remove(os.path.join(pa, "block_1.npy"))
        assert np.allclose(app_inst.read_fs(pa).get(), a)
        app_inst.delete_fs(pa)
        app_inst.delete_fs(pb)
    finally:
        settings.replica_roots = old


def test_many_replicas_discovered_and_deleted(app_inst, tmp_path):
    p = str(tmp_path / "many")
    x = np.arange(6, dtype=float)
    app_inst.write_fs(app_inst.array(x, block_shape=(3,)), p, replicas=10)
    from nums_tpu.core.io.filesystem import _existing_replicas

    reps = _existing_replicas(p)
    assert len(reps) == 9, reps
    os.remove(os.path.join(p, "block_0.npy"))
    assert np.allclose(app_inst.read_fs(p).get(), x)
    app_inst.delete_fs(p)
    assert _existing_replicas(p) == []


def test_journal_tolerates_torn_line(app_inst, tmp_path):
    name = str(tmp_path / "jrn")
    a = np.arange(4, dtype=float)
    checkpoint.save(app_inst.array(a, block_shape=(4,)), name, step=0)
    with open(os.path.join(name, "journal.log"), "a") as f:
        f.write("172390000.1 com")  # torn append (no newline, 2 fields)
    events = checkpoint.journal(name)
    assert ("begin", 0) in [(e, s) for _, e, s in events]
    checkpoint.delete(name)


def test_save_async_ordered_and_restorable(app_inst, tmp_path):
    """Async saves snapshot call-time values, publish in order, and
    surface worker errors through the future."""
    name = str(tmp_path / "async_ckpt")
    rs = np.random.RandomState(3)
    arrays = [rs.randn(6, 3) for _ in range(3)]
    handles = [
        checkpoint.save_async(
            app_inst.array(a, block_shape=(3, 3)), name, step=i, keep=2
        )
        for i, a in enumerate(arrays)
    ]
    assert [h.result() for h in handles] == [0, 1, 2]
    checkpoint.wait_pending()
    assert checkpoint.steps(name) == [1, 2]  # keep=2 pruning held
    step, back = checkpoint.restore_latest(name)
    assert step == 2 and np.allclose(back.get(), arrays[2])
    events = [(e, s) for _, e, s in checkpoint.journal(name)]
    # Ordered worker: step k commits before step k+1 begins.
    assert events.index(("commit", 0)) < events.index(("begin", 1))
    assert events.index(("commit", 1)) < events.index(("begin", 2))
    checkpoint.delete(name)
    # A worker failure surfaces on .result().
    bad = checkpoint.save_async(
        app_inst.array(np.zeros(2), block_shape=(2,)),
        "/proc/definitely/not/writable/x", step=0,
    )
    try:
        bad.result()
        raised = False
    except Exception:
        raised = True
    assert raised
    checkpoint.wait_pending()
