"""Real-hardware test tier.

The main suite forces CPU (deterministic, 8 virtual devices,
``tests/conftest.py``); this module is the opt-in hardware tier that
drives the numerical smoke suite (``scripts/tpu_smoke.py``) on the REAL
default backend — TPU when attached — in a clean subprocess (no CPU env
forcing), catching platform-specific regressions (e.g. the axon
duplicate-argument OOM found in round 1, or precision drift between the
CPU and TPU XLA backends).

Opt in with ``NUMS_TPU_HW_TESTS=1`` (also runs as a stage of
``scripts/ci_gate.sh`` when that variable is set). Skipped by default:
the shared TPU chip must not be hit by every CI run, and two concurrent
TPU processes can wedge the chip.
"""

import os
import subprocess
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_smoke_suite_cpu_subprocess():
    """The smoke suite exactly as hw_round5.sh invokes it — a child
    ``python scripts/tpu_smoke.py`` from the repo root — on the CPU
    backend. Catches launcher-level breakage (the sys.path bootstrap,
    env handling) that the importlib-based mode smokes cannot see:
    round 5's hardware batch burned its smoke step on a
    ModuleNotFoundError no in-process test could reproduce."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join("scripts", "tpu_smoke.py")],
        env=env, cwd=_ROOT, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\n{proc.stdout[-2000:]}{proc.stderr[-2000:]}"
    )
    assert "OVERALL: PASS" in proc.stdout


@pytest.mark.tpu
@pytest.mark.skipif(
    os.environ.get("NUMS_TPU_HW_TESTS", "0") in ("0", "false", ""),
    reason="hardware tier is opt-in: set NUMS_TPU_HW_TESTS=1",
)
def test_tpu_smoke_suite():
    env = dict(os.environ)
    # Undo the CPU forcing this pytest process runs under (conftest sets
    # these BEFORE jax init; the child must see the real platform).
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "scripts", "tpu_smoke.py")],
        env=env, cwd=_ROOT, capture_output=True, text=True, timeout=1800,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0, "hardware smoke suite failed (see output)"
    assert "OVERALL: PASS" in proc.stdout
