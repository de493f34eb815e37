"""ctypes binding + .npy plumbing for the native shard-I/O engine.

``write_shards``/``read_block_windows`` keep the exact on-disk format of
the Python path (one standard ``.npy`` per block: headers built with
``numpy.lib.format``), so checkpoints are interchangeable between the
native and fallback paths and readable by plain ``np.load``. The C++
pool (shard_io.cpp) does the file I/O with the GIL released.
"""

import ctypes
import io
import os
import subprocess
import threading

import numpy as np

from nums_tpu.core import settings

_lock = threading.Lock()
_lib = None
_tried = False


def _build_lib_path():
    src = os.path.join(os.path.dirname(__file__), "shard_io.cpp")
    outdir = os.path.join(settings.data_dir, "native")
    os.makedirs(outdir, exist_ok=True)
    so = os.path.join(outdir, "libnums_shard.so")
    if os.path.isfile(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    for cc in ("c++", "g++"):
        try:
            subprocess.run(
                [cc, "-O3", "-std=c++17", "-shared", "-fPIC", src,
                 "-o", so, "-lpthread"],
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
        pp = ctypes.POINTER(ctypes.c_char_p)
        pl = ctypes.POINTER(ctypes.c_long)
        pb = ctypes.POINTER(ctypes.c_void_p)
        lib.nums_write_shards.restype = ctypes.c_long
        lib.nums_write_shards.argtypes = [pp, pb, pl, pb, pl,
                                          ctypes.c_long, ctypes.c_int]
        lib.nums_read_regions.restype = ctypes.c_long
        lib.nums_read_regions.argtypes = [pp, pl, pl, pl, pl, pb, pl,
                                          ctypes.c_long, ctypes.c_int]
        _lib = lib
        return _lib


def _npy_header(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.lib.format.write_array_header_1_0(
        buf, np.lib.format.header_data_from_array_1_0(arr)
    )
    return buf.getvalue()


def write_shards(items, threads=None) -> bool:
    """Write [(path, np.ndarray), ...] as .npy files in parallel C.

    Returns False (caller falls back to np.save) when the native lib is
    unavailable or an array isn't plain-contiguous-writable.
    """
    lib = get_lib()
    if lib is None or not items:
        return False
    arrays = []
    for _, a in items:
        if a.dtype.hasobject:
            return False
        arrays.append(np.ascontiguousarray(a))
    headers = [_npy_header(a) for a in arrays]
    n = len(items)
    paths = (ctypes.c_char_p * n)(
        *[p.encode() for p, _ in items]
    )
    hbufs = (ctypes.c_void_p * n)(
        *[ctypes.cast(ctypes.c_char_p(h), ctypes.c_void_p) for h in headers]
    )
    hlens = (ctypes.c_long * n)(*[len(h) for h in headers])
    dbufs = (ctypes.c_void_p * n)(
        *[a.ctypes.data_as(ctypes.c_void_p) for a in arrays]
    )
    dlens = (ctypes.c_long * n)(*[a.nbytes for a in arrays])
    if threads is None:
        threads = min(16, max(1, os.cpu_count() or 1), n)
    rc = lib.nums_write_shards(
        ctypes.cast(paths, ctypes.POINTER(ctypes.c_char_p)),
        ctypes.cast(hbufs, ctypes.POINTER(ctypes.c_void_p)),
        hlens,
        ctypes.cast(dbufs, ctypes.POINTER(ctypes.c_void_p)),
        dlens, n, threads,
    )
    # keep the header bytes + arrays alive through the call
    del headers, arrays
    return rc == 0


def npy_layout(path):
    """(data_offset, shape, fortran, dtype) of a .npy file, or None."""
    try:
        with open(path, "rb") as f:
            version = np.lib.format.read_magic(f)
            shape, fortran, dtype = np.lib.format._read_array_header(
                f, version
            )
            return f.tell(), shape, fortran, dtype
    except Exception:
        return None


def read_block_windows(jobs, out: np.ndarray, threads=None) -> bool:
    """Parallel strided window reads into ``out``.

    jobs: [(path, src_slices, dst_slices)] — window ``src_slices`` of the
    stored block at ``path`` lands at ``dst_slices`` of ``out``. Handles
    C-contiguous 1-D/2-D blocks; returns False to fall back otherwise.
    """
    lib = get_lib()
    if lib is None or not jobs:
        return False
    if not out.flags["C_CONTIGUOUS"] or out.ndim not in (1, 2):
        return False
    item = out.itemsize
    paths, offs, rbytes, nrows, sstride, dsts, dstride = (
        [], [], [], [], [], [], []
    )
    base = out.ctypes.data
    for path, src, dst in jobs:
        layout = npy_layout(path)
        if layout is None:
            return False
        data_off, shape, fortran, dtype = layout
        if fortran or dtype != out.dtype or len(shape) != out.ndim:
            return False
        if out.ndim == 1:
            (s,), (d,) = src, dst
            offs.append(data_off + s.start * item)
            rbytes.append((s.stop - s.start) * item)
            nrows.append(1)
            sstride.append(0)
            dsts.append(base + d.start * item)
            dstride.append(0)
        else:
            (sr, sc), (dr, dc) = src, dst
            src_row = shape[1] * item
            dst_row = out.shape[1] * item
            offs.append(data_off + sr.start * src_row + sc.start * item)
            rbytes.append((sc.stop - sc.start) * item)
            nrows.append(sr.stop - sr.start)
            sstride.append(src_row)
            dsts.append(base + dr.start * dst_row + dc.start * item)
            dstride.append(dst_row)
        paths.append(path.encode())
    n = len(paths)
    if threads is None:
        threads = min(16, max(1, os.cpu_count() or 1), n)
    rc = lib.nums_read_regions(
        ctypes.cast((ctypes.c_char_p * n)(*paths),
                    ctypes.POINTER(ctypes.c_char_p)),
        (ctypes.c_long * n)(*offs),
        (ctypes.c_long * n)(*rbytes),
        (ctypes.c_long * n)(*nrows),
        (ctypes.c_long * n)(*sstride),
        ctypes.cast((ctypes.c_void_p * n)(*dsts),
                    ctypes.POINTER(ctypes.c_void_p)),
        (ctypes.c_long * n)(*dstride),
        n, threads,
    )
    return rc == 0
