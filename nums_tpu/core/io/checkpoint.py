"""Versioned checkpoints with corruption-tolerant restore.

The failure-recovery subsystem the reference lists as TODO
(``nums/core/systems/filesystem.py:217-222``: idempotency, replication,
journaling). Built on ``write_fs``'s crash-consistent atomic publish:

- ``save(ba, name)`` writes ``<name>/step_<k>`` and prunes old versions
  (``keep`` most recent are retained as implicit replicas);
  ``replicas=k`` additionally writes k full copies per step (block-level
  replication with per-block failover + CRC scrub — see
  ``FileSystem.write_fs``/``verify_fs``).
- ``restore_latest(name)`` walks versions newest-first and returns the
  first that loads cleanly — a torn/corrupted step falls back to the
  previous one instead of failing the job; ``verify=True`` CRC-checks
  every block (silent corruption falls over to replicas or the previous
  step).
- ``resume_step(name)`` tells a training loop where to restart.
- ``journal(name)`` returns the append-only event log (begin/commit/
  prune/restore with wall timestamps) — the journaling the reference
  lists as TODO; useful for post-mortem and idempotency audits.

This is checkpoint-based elastic recovery (re-run from the last good
state), the standard recovery model for SPMD jobs — per-task lineage
re-execution (Ray's model) has no analogue under static SPMD.
"""

import os
import re
import shutil
import time

from nums_tpu.core import settings


def _journal_append(root: str, event: str, step):
    try:
        os.makedirs(root, exist_ok=True)
        with open(os.path.join(root, "journal.log"), "a") as f:
            f.write(f"{time.time():.3f} {event} {step}\n")
    except OSError:  # journaling must never fail the job
        pass


def journal(name: str):
    """[(timestamp, event, step)] from the checkpoint's event log."""
    p = os.path.join(_root(name), "journal.log")
    if not os.path.isfile(p):
        return []
    out = []
    with open(p) as f:
        for line in f:
            # Appends are non-atomic: a crash mid-append leaves a torn
            # final line. The readable prefix is the journal.
            try:
                ts, event, step = line.split()
                out.append((float(ts), event, int(step)))
            except ValueError:
                continue
    return out


_STEP_RE = re.compile(r"^step_(\d+)$")


def _root(name: str) -> str:
    if os.path.isabs(name):
        return name
    return os.path.join(settings.data_dir, name)


def _fs(app):
    return app.fs


def steps(name: str):
    """Sorted list of complete checkpoint step numbers.

    Recovery-aware: a step torn mid-publish (crash between the two
    publish renames) is promoted from its complete orphan directory
    instead of silently disappearing."""
    from nums_tpu.core.io.filesystem import _recover_fs_dir

    root = _root(name)
    if not os.path.isdir(root):
        return []
    orphan_re = re.compile(r"^step_(\d+)\.(?:tmp|old)-\d+$")
    nums = set()
    for entry in os.listdir(root):
        m = _STEP_RE.match(entry) or orphan_re.match(entry)
        if m:
            nums.add(int(m.group(1)))
    return [
        n for n in sorted(nums)
        if _recover_fs_dir(os.path.join(root, f"step_{n}"))
    ]


def save(ba, name: str, step: int, keep: int = 2, replicas: int = None):
    """Write ``<name>/step_<step>`` atomically; prune to ``keep`` newest."""
    from nums_tpu.core.application_manager import instance

    app = instance()
    root = _root(name)
    os.makedirs(root, exist_ok=True)
    _journal_append(root, "begin", step)
    _fs(app).write_fs(ba, os.path.join(root, f"step_{step}"),
                      replicas=replicas)
    _journal_append(root, "commit", step)
    if keep is not None and keep > 0:
        for old in steps(name)[:-keep]:
            _fs(app).delete_fs(os.path.join(root, f"step_{old}"))
            _journal_append(root, "prune", old)
    return step


_async_executor = None


def _executor():
    global _async_executor
    if _async_executor is None:
        from concurrent.futures import ThreadPoolExecutor

        # ONE worker: async saves are strictly ordered (step k publishes
        # before step k+1 starts), so pruning and the journal stay
        # consistent.
        _async_executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-save"
        )
    return _async_executor


def save_async(ba, name: str, step: int, keep: int = 2,
               replicas: int = None):
    """Non-blocking ``save``: the device→host fetch and disk writes run
    on a background worker so the training loop keeps the chip busy.

    The array is materialized (``touch``) in the CALLER's thread first —
    BlockArrays are immutable, so the snapshot is exactly the value at
    call time, and the worker never races the main thread's lazy
    engine. Returns a Future; ``.result()`` yields the step number and
    re-raises any write error. Saves are ordered (single worker).
    """
    ba.touch()
    from nums_tpu.core import multiprocess as _mp

    if _mp.is_multiprocess():
        # Multi-controller write_fs is COLLECTIVE (barriers + an
        # all-process block fan-out); running it on a per-process
        # background thread would let collective order diverge across
        # hosts and deadlock. Degrade to a synchronous save.
        from concurrent.futures import Future

        f = Future()
        try:
            f.set_result(save(ba, name, step, keep, replicas))
        except Exception as e:  # KeyboardInterrupt etc. must propagate
            f.set_exception(e)
        return f
    return _executor().submit(save, ba, name, step, keep, replicas)


def wait_pending():
    """Block until every in-flight ``save_async`` has published."""
    global _async_executor
    if _async_executor is not None:
        _async_executor.shutdown(wait=True)
        _async_executor = None


def restore_latest(name: str, verify: bool = False):
    """(step, BlockArray) of the newest checkpoint that loads cleanly.

    Skips torn/corrupted versions (missing blocks, bad pickles) and
    falls back to older ones; missing/corrupt blocks fail over to
    replica copies first when the step was saved with ``replicas>1``.
    ``verify=True`` CRC-checks every block. Raises FileNotFoundError
    when none load.
    """
    from nums_tpu.core.application_manager import instance

    app = instance()
    root = _root(name)
    for step in reversed(steps(name)):
        try:
            ba = _fs(app).read_fs(
                os.path.join(root, f"step_{step}"), verify=verify
            )
            _journal_append(root, "restore", step)
            return step, ba
        except Exception:  # torn checkpoint: try the previous version
            continue
    raise FileNotFoundError(f"no restorable checkpoint under {root}")


def resume_step(name: str, default: int = 0) -> int:
    """The step AFTER the newest complete checkpoint (training restart)."""
    s = steps(name)
    return (s[-1] + 1) if s else default


def delete(name: str):
    shutil.rmtree(_root(name), ignore_errors=True)
