"""Subprocess line-coverage bootstrap for ``scripts/linecov.py``.

``linecov.py`` prepends this directory to ``PYTHONPATH`` so every child
interpreter the suite spawns (``jax.distributed`` multi-host workers,
the dryrun device-count subprocesses, xgboost trackers, ...) imports
this module at startup via ``site``. It activates only when
``NUMS_TPU_LINECOV_DIR`` is set: it mirrors the parent's
``sys.monitoring`` first-hit LINE collector over the package prefixes
in ``NUMS_TPU_LINECOV_PKGS`` and dumps the hit set as JSON at
interpreter exit, where ``linecov.py`` merges it (ROADMAP: worker-only
lines in ``core/multiprocess.py`` were exercised by the e2e but not
counted).

This module SHADOWS the environment's own ``sitecustomize`` (this
container injects one via ``PYTHONPATH`` that registers the axon PJRT
plugin), so it always chain-loads the next ``sitecustomize`` on
``sys.path`` afterwards — silently swallowing it would change which
jax backends exist in every child.
"""

import os
import sys

_dir = os.environ.get("NUMS_TPU_LINECOV_DIR")
_prefixes = tuple(
    p + os.sep
    for p in os.environ.get("NUMS_TPU_LINECOV_PKGS", "").split(os.pathsep)
    if p
)

if _dir and _prefixes and sys.monitoring.get_tool(
    sys.monitoring.COVERAGE_ID
) is None:
    import atexit
    import json

    _TOOL = sys.monitoring.COVERAGE_ID
    _covered = {}

    def _on_line(code, line):
        fn = code.co_filename
        for p in _prefixes:
            if fn.startswith(p):
                _covered.setdefault(fn, set()).add(line)
                break
        return sys.monitoring.DISABLE

    def _dump():
        sys.monitoring.set_events(_TOOL, 0)
        if not _covered:
            return
        out = os.path.join(
            _dir, f"cov_{os.getpid()}_{id(_covered):x}.json"
        )
        try:
            with open(out, "w") as f:
                json.dump({k: sorted(v) for k, v in _covered.items()}, f)
        except OSError:
            pass  # best-effort: a killed worker loses its dump anyway

    sys.monitoring.use_tool_id(_TOOL, "linecov-subproc")
    sys.monitoring.register_callback(
        _TOOL, sys.monitoring.events.LINE, _on_line
    )
    sys.monitoring.set_events(_TOOL, sys.monitoring.events.LINE)
    atexit.register(_dump)

# Chain-load the environment's own sitecustomize (shadowed by this one).
_here = os.path.dirname(os.path.abspath(__file__))
_mine = sys.modules.pop("sitecustomize", None)
_saved_path = list(sys.path)
try:
    sys.path[:] = [
        p
        for p in sys.path
        if os.path.abspath(p or os.getcwd()) != _here
    ]
    try:
        import sitecustomize  # noqa: F401  (the environment's own)
    except ImportError:
        if _mine is not None:
            sys.modules["sitecustomize"] = _mine
finally:
    sys.path[:] = _saved_path
