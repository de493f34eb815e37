"""Failure release for the collective writers (ADVICE r4 medium):
if process 0 dies mid-write (disk full, kernel error), peers blocked at
the completion barrier must be RELEASED (barrier reached via finally)
and must RAISE (failure marker) instead of opening a torn result.

The protocol is tested deterministically by faking the multiprocess
module per role — p0's failing run first, then a peer's run against the
resulting on-disk state (the real cross-process wiring is e2e-covered
by tests/test_multihost.py)."""

import os

import numpy as np
import pytest

from nums_tpu.core import multiprocess as mp
from nums_tpu.core.array.diskarray import DiskArray


class _FakeMP:
    def __init__(self, monkeypatch, index, count=2):
        self.barriers = []
        monkeypatch.setattr(mp, "is_multiprocess", lambda: True)
        monkeypatch.setattr(mp, "process_index", lambda: index)
        monkeypatch.setattr(mp, "process_count", lambda: count)
        monkeypatch.setattr(
            mp, "barrier", lambda name: self.barriers.append(name)
        )
        monkeypatch.setattr(
            mp, "allgather_to_host", lambda x: np.asarray(x)
        )


def _bad_panels():
    yield np.ones((4, 3), dtype=np.float32)
    yield np.ones((4, 2), dtype=np.float32)  # wrong width: p0 write dies


def _good_panels():
    yield np.ones((4, 3), dtype=np.float32)
    yield np.ones((4, 3), dtype=np.float32)


def test_from_panels_p0_failure_releases_barrier_and_marks(
    tmp_path, monkeypatch, app_inst
):
    path = str(tmp_path / "arr")
    fake = _FakeMP(monkeypatch, index=0)
    with pytest.raises(AssertionError):
        DiskArray.from_panels(path, app_inst.fs, _bad_panels(),
                              (8, 3), np.float32, 4)
    # The barrier RAN despite the failure (peers are released) ...
    assert fake.barriers, "process 0 never released the barrier"
    # ... and the marker tells them why.
    assert os.path.exists(path + ".ingest-failed")


def test_from_panels_peer_raises_on_marker(
    tmp_path, monkeypatch, app_inst
):
    path = str(tmp_path / "arr")
    open(path + ".ingest-failed", "w").close()
    fake = _FakeMP(monkeypatch, index=1)
    with pytest.raises(RuntimeError, match="failed on process 0"):
        DiskArray.from_panels(path, app_inst.fs, _good_panels(),
                              (8, 3), np.float32, 4)
    assert fake.barriers  # released first, raised second


def test_from_panels_retry_consumes_stale_marker(
    tmp_path, monkeypatch, app_inst
):
    path = str(tmp_path / "arr")
    open(path + ".ingest-failed", "w").close()  # from a PRIOR failure
    _FakeMP(monkeypatch, index=0)
    da = DiskArray.from_panels(path, app_inst.fs, _good_panels(),
                               (8, 3), np.float32, 4)
    assert da.shape == (8, 3)
    assert not os.path.exists(path + ".ingest-failed")
    # A peer of the successful retry opens the result cleanly.
    _FakeMP(monkeypatch, index=1)
    da2 = DiskArray.from_panels(path, app_inst.fs, _good_panels(),
                                (8, 3), np.float32, 4)
    assert np.allclose(da2.row_panel(0), 1.0)


def test_write_parquet_p0_failure_releases_and_marks(
    tmp_path, monkeypatch, app_inst
):
    pytest.importorskip("pyarrow")
    from nums_tpu.api import write_parquet

    ba = app_inst.array(np.ones((8, 3)), block_shape=(4, 3))
    target = str(tmp_path / "out.parquet")
    os.makedirs(target)  # ParquetWriter(path-to-a-directory) raises
    fake = _FakeMP(monkeypatch, index=0)
    with pytest.raises(Exception):
        write_parquet(ba, target)
    assert fake.barriers, "process 0 never released the barrier"
    assert os.path.exists(target + ".write-failed")

    # Peer of the same collective call: released, then raises.
    fake = _FakeMP(monkeypatch, index=1)
    with pytest.raises(RuntimeError, match="failed on process 0"):
        write_parquet(ba, target)
    assert fake.barriers


def test_write_parquet_diskarray_peer_raises_on_marker(
    tmp_path, monkeypatch, app_inst
):
    pytest.importorskip("pyarrow")
    from nums_tpu.api import write_parquet

    da = DiskArray.from_panels(str(tmp_path / "src"), app_inst.fs,
                               _good_panels(), (8, 3), np.float32, 4)
    target = str(tmp_path / "out.parquet")
    open(target + ".write-failed", "w").close()
    fake = _FakeMP(monkeypatch, index=1)
    with pytest.raises(RuntimeError, match="failed on process 0"):
        write_parquet(da, target)
    assert fake.barriers


def test_write_parquet_p0_retry_consumes_stale_marker(
    tmp_path, monkeypatch, app_inst
):
    pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from nums_tpu.api import write_parquet

    ba = app_inst.array(np.ones((8, 3)), block_shape=(4, 3))
    target = str(tmp_path / "out.parquet")
    open(target + ".write-failed", "w").close()  # PRIOR failure
    _FakeMP(monkeypatch, index=0)
    write_parquet(ba, target)
    assert not os.path.exists(target + ".write-failed")
    assert pq.read_table(target).num_rows == 8
