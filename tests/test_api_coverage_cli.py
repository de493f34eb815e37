"""The API-coverage CLI as a unit: report shape, floor gate, fallback
ceiling (the gates `scripts/ci_gate.sh` runs — reference parity with
``nums/core/cmds/api_coverage.py`` + the codecov floor role)."""

from nums_tpu.cmds import api_coverage


def test_report_lists_all_four_surfaces(capsys):
    assert api_coverage.main([]) == 0
    out = capsys.readouterr().out
    for section in ("numpy:", "numpy.random:", "numpy.linalg:",
                    "numpy.fft:"):
        assert section in out, out
    assert "stubs 0, missing 0" in out


def test_floor_gate(capsys):
    assert api_coverage.main(["--min", "numpy=100,numpy.fft=100"]) == 0
    assert "coverage floors OK" in capsys.readouterr().out
    assert api_coverage.main(["--min", "numpy=101"]) == 1
    assert "FAIL: numpy coverage" in capsys.readouterr().out
    # Unknown module fails loudly rather than passing silently.
    assert api_coverage.main(["--min", "nosuch=1"]) == 1


def test_fallback_ceiling_gate(capsys):
    assert api_coverage.main(["--max-fallbacks", "numpy=500"]) == 0
    capsys.readouterr()
    assert api_coverage.main(["--max-fallbacks", "numpy=0"]) == 1
    assert "host fallbacks" in capsys.readouterr().out


def test_module_coverage_classification():
    import numpy as np

    import nums_tpu.numpy as nps

    impl, fb, stubs, miss = api_coverage._module_coverage(np, nps)
    assert not stubs and not miss
    # The curated fallback list is the ceiling the CI gate enforces.
    assert set(fb) <= api_coverage.HOST_FALLBACK
    assert len(impl) > 300
