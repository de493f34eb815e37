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


def parse_bytes(data: bytes, delimiter: str):
    """Parse delimiter-separated numeric text → (np.ndarray 2-D, ok).

    Returns (None, False) when the native lib is unavailable or the text
    isn't purely numeric (caller falls back to np.loadtxt).
    """
    lib = get_lib()
    if lib is None or not data:
        return None, False
    # Capacity estimate: one value per >=2 bytes is conservative for
    # numeric text; add headroom for tiny inputs.
    max_vals = max(64, len(data) // 2 + 16)
    out = np.empty(max_vals, dtype=np.float64)
    n_rows = ctypes.c_long(0)
    n_cols = ctypes.c_long(0)
    n = lib.nums_parse_csv(
        data, len(data), delimiter.encode()[0:1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_vals, ctypes.byref(n_rows), ctypes.byref(n_cols),
    )
    if n < 0 or n_cols.value == 0:
        return None, False
    rows, cols = n_rows.value, n_cols.value
    if rows * cols != n:
        return None, False  # ragged rows: fall back
    return out[:n].reshape(rows, cols), True
