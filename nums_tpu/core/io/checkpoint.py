"""Versioned checkpoints with corruption-tolerant restore.

The failure-recovery subsystem the reference lists as TODO
(``nums/core/systems/filesystem.py:217-222``: idempotency, replication,
journaling). Built on ``write_fs``'s crash-consistent atomic publish:

- ``save(ba, name)`` writes ``<name>/step_<k>`` and prunes old versions
  (``keep`` most recent are retained as implicit replicas).
- ``restore_latest(name)`` walks versions newest-first and returns the
  first that loads cleanly — a torn/corrupted step falls back to the
  previous one instead of failing the job.
- ``resume_step(name)`` tells a training loop where to restart.

This is checkpoint-based elastic recovery (re-run from the last good
state), the standard recovery model for SPMD jobs — per-task lineage
re-execution (Ray's model) has no analogue under static SPMD.
"""

import os
import re
import shutil

from nums_tpu.core import settings


_STEP_RE = re.compile(r"^step_(\d+)$")


def _root(name: str) -> str:
    if os.path.isabs(name):
        return name
    return os.path.join(settings.data_dir, name)


def _fs(app):
    return app.fs


def steps(name: str):
    """Sorted list of complete checkpoint step numbers."""
    root = _root(name)
    if not os.path.isdir(root):
        return []
    out = []
    for entry in os.listdir(root):
        m = _STEP_RE.match(entry)
        if m and os.path.isfile(os.path.join(root, entry, "meta.pkl")):
            out.append(int(m.group(1)))
    return sorted(out)


def save(ba, name: str, step: int, keep: int = 2):
    """Write ``<name>/step_<step>`` atomically; prune to ``keep`` newest."""
    from nums_tpu.core.application_manager import instance

    app = instance()
    root = _root(name)
    os.makedirs(root, exist_ok=True)
    _fs(app).write_fs(ba, os.path.join(root, f"step_{step}"))
    if keep is not None and keep > 0:
        for old in steps(name)[:-keep]:
            shutil.rmtree(
                os.path.join(root, f"step_{old}"), ignore_errors=True
            )
    return step


def restore_latest(name: str):
    """(step, BlockArray) of the newest checkpoint that loads cleanly.

    Skips torn/corrupted versions (missing blocks, bad pickles) and
    falls back to older ones. Raises FileNotFoundError when none load.
    """
    from nums_tpu.core.application_manager import instance

    app = instance()
    root = _root(name)
    for step in reversed(steps(name)):
        try:
            ba = _fs(app).read_fs(os.path.join(root, f"step_{step}"))
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
