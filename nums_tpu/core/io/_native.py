"""Lazy builder/loader for the native CSV parser (ctypes binding).

Compiles ``csv_parser.cpp`` once into the data dir and binds it with
ctypes. The C call releases the GIL, so the ThreadPool in
``FileSystem.read_csv`` parses byte ranges on real parallel threads.
Falls back cleanly (returns None) if no compiler is available.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

from nums_tpu.core import settings

_lock = threading.Lock()
_lib = None
_tried = False


def _build_lib_path():
    src = os.path.join(os.path.dirname(__file__), "csv_parser.cpp")
    outdir = os.path.join(settings.data_dir, "native")
    os.makedirs(outdir, exist_ok=True)
    so = os.path.join(outdir, "libnums_csv.so")
    if os.path.isfile(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    for cc in ("c++", "g++", "cc", "gcc"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True, timeout=120,
            )
            return so
        except Exception:
            continue
    return None


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build_lib_path()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.nums_parse_csv.restype = ctypes.c_long
        lib.nums_parse_csv.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_char,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
        _lib = lib
        return _lib


def count_values(data: bytes, delimiter: str) -> int:
    """EXACT value count of delimiter-separated numeric text: one value
    per delimiter plus one per row (newline-terminated or final
    unterminated line). Lets callers size the output buffer exactly
    instead of the conservative len/2 estimate (4x over-allocation on
    ~9-byte values — pure page-fault churn)."""
    if not data:
        return 0
    d = delimiter.encode()[0:1]
    rows = data.count(b"\n")
    if not data.endswith(b"\n"):
        rows += 1
    return data.count(d) + rows


def parse_bytes_into(data: bytes, delimiter: str, out):
    """Parse into a caller-provided contiguous float64 buffer (e.g. a
    slice of one file-wide array, so P ranges assemble with no concat
    copy). Returns (n_values, n_rows, n_cols, ok)."""
    lib = get_lib()
    if lib is None or not data:
        return 0, 0, 0, False
    assert out.dtype == np.float64 and out.flags.c_contiguous, out.dtype
    n_rows = ctypes.c_long(0)
    n_cols = ctypes.c_long(0)
    n = lib.nums_parse_csv(
        data, len(data), delimiter.encode()[0:1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.size, ctypes.byref(n_rows), ctypes.byref(n_cols),
    )
    if n < 0 or n_cols.value == 0:
        return 0, 0, 0, False
    if n_rows.value * n_cols.value != n:
        return 0, 0, 0, False  # ragged rows: fall back
    return n, n_rows.value, n_cols.value, True


def parse_bytes(data: bytes, delimiter: str):
    """Parse delimiter-separated numeric text → (np.ndarray 2-D, ok).

    Returns (None, False) when the native lib is unavailable or the text
    isn't purely numeric (caller falls back to np.loadtxt).
    """
    if get_lib() is None or not data:
        return None, False
    out = np.empty(max(64, count_values(data, delimiter)), np.float64)
    n, rows, cols, ok = parse_bytes_into(data, delimiter, out)
    if not ok:
        return None, False
    return out[:n].reshape(rows, cols), True
