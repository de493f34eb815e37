"""The native CSV engine's edge paths: empty input, ragged fallback,
fresh compilation into a new data dir, and the no-compiler fallback
(previously only the happy path ran — the .so is cached across runs)."""

import numpy as np

from nums_tpu.core import settings
from nums_tpu.core.io import _native


def test_empty_and_ragged_inputs():
    assert _native.count_values(b"", ",") == 0
    assert _native.count_values(b"1,2\n3,4", ",") == 4  # unterminated
    n, r, c, ok = _native.parse_bytes_into(
        b"", ",", np.empty(4, np.float64)
    )
    assert (n, ok) == (0, False)
    arr, ok = _native.parse_bytes(b"", ",")
    assert arr is None and not ok
    if _native.get_lib() is not None:
        arr, ok = _native.parse_bytes(b"1,2\n3\n", ",")  # ragged rows
        assert not ok


def test_fresh_compile_into_new_data_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(settings, "data_dir", str(tmp_path))
    monkeypatch.setattr(_native, "_lib", None)
    monkeypatch.setattr(_native, "_tried", False)
    lib = _native.get_lib()
    assert lib is not None  # compiled from source, not the cached .so
    arr, ok = _native.parse_bytes(b"1.5,2\n3,4\n", ",")
    assert ok and np.allclose(arr, [[1.5, 2.0], [3.0, 4.0]])


def test_no_compiler_clean_fallback(tmp_path, monkeypatch):
    monkeypatch.setattr(settings, "data_dir", str(tmp_path / "nd"))
    monkeypatch.setattr(_native, "_lib", None)
    monkeypatch.setattr(_native, "_tried", False)

    def boom(*a, **k):
        raise OSError("no compiler")

    monkeypatch.setattr(_native.subprocess, "run", boom)
    assert _native.get_lib() is None
    assert _native.get_lib() is None  # _tried short-circuits
    arr, ok = _native.parse_bytes(b"1,2\n", ",")
    assert arr is None and not ok
