"""Driver-interface guard: dryrun_multichip must work at device counts
beyond the suite's 8 (subprocess with its own forced device count)."""

import subprocess
import sys

import pytest


@pytest.mark.parametrize("n", [4, 16])
def test_dryrun_device_counts(n):
    code = (
        "import __graft_entry__ as g; "
        f"g.dryrun_multichip({n}); print('DRYRUN_OK')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=540,
        env={
            **__import__("os").environ,
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={n}",
            "JAX_PLATFORMS": "cpu",
        },
        cwd=__import__("os").path.dirname(
            __import__("os").path.dirname(__import__("os").path.abspath(__file__))
        ),
    )
    assert out.returncode == 0, out.stderr[-1500:]
    assert "DRYRUN_OK" in out.stdout
