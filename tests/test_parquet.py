"""read_parquet ingestion (beyond the reference; requires pyarrow)."""

import numpy as np
import pytest

pq = pytest.importorskip("pyarrow.parquet")
import pyarrow as pa  # noqa: E402

import nums_tpu  # noqa: E402


def test_read_parquet_roundtrip(nps_app_inst, tmp_path):
    rs = np.random.RandomState(0)
    data = rs.randn(1000, 5)
    table = pa.table({f"c{i}": data[:, i] for i in range(5)})
    p = str(tmp_path / "t.parquet")
    pq.write_table(table, p, row_group_size=256)  # 4 row groups
    ba = nums_tpu.read_parquet(p)
    assert ba.shape == (1000, 5)
    assert np.allclose(ba.get(), data)
    # column subset + dtype coercion
    ba2 = nums_tpu.read_parquet(p, columns=["c1", "c3"], dtype=np.float32)
    assert ba2.shape == (1000, 2) and ba2.dtype == np.float32
    assert np.allclose(ba2.get(), data[:, [1, 3]].astype(np.float32))


def test_read_parquet_out_of_core(nps_app_inst, tmp_path):
    """out=<path> streams row groups straight to a DiskArray."""
    from nums_tpu.core.array.diskarray import DiskArray

    rs = np.random.RandomState(1)
    data = rs.randn(777, 4)  # ragged vs any block size
    table = pa.table({f"c{i}": data[:, i] for i in range(4)})
    p = str(tmp_path / "big.parquet")
    pq.write_table(table, p, row_group_size=100)
    da = nums_tpu.read_parquet(p, out=str(tmp_path / "daX"),
                               block_rows=150)
    assert isinstance(da, DiskArray)
    assert da.shape == (777, 4)
    assert np.allclose(da.to_block_array().get(), data)
    # and it is a first-class checkpoint (CRC scrub clean)
    assert nps_app_inst.verify_fs(da.path)["ok"]


def test_write_parquet_roundtrip(nps_app_inst, tmp_path):
    rs = np.random.RandomState(2)
    data = rs.randn(300, 3)
    ba = nps_app_inst.array(data, block_shape=(100, 3))
    p = str(tmp_path / "w.parquet")
    nums_tpu.api.write_parquet(ba, p, column_names=["a", "b", "c"])
    back = nums_tpu.read_parquet(p)
    assert np.allclose(back.get(), data)
    # DiskArray source writes too (stream -> stream)
    da = nps_app_inst.spill(ba, str(tmp_path / "spilled"))
    p2 = str(tmp_path / "w2.parquet")
    nums_tpu.api.write_parquet(da, p2)
    assert np.allclose(nums_tpu.read_parquet(p2).get(), data)


def test_parquet_block_rows_and_zero_rows(nps_app_inst, tmp_path):
    rs = np.random.RandomState(3)
    data = rs.randn(120, 3)
    table = pa.table({f"c{i}": data[:, i] for i in range(3)})
    p = str(tmp_path / "br.parquet")
    pq.write_table(table, p, row_group_size=50)
    # block_rows honored on the IN-CORE path too (was silently ignored).
    ba = nums_tpu.read_parquet(p, block_rows=40)
    assert ba.block_shape[0] == 40
    assert np.allclose(ba.get(), data)
    with pytest.raises(AssertionError):
        nums_tpu.read_parquet(p, out=str(tmp_path / "x"), block_rows=0)
    # Zero-row arrays round-trip as a valid empty parquet file.
    empty = nps_app_inst.array(np.empty((0, 2)), block_shape=(1, 2))
    pe = str(tmp_path / "empty.parquet")
    nums_tpu.api.write_parquet(empty, pe, column_names=["a", "b"])
    back = pq.read_table(pe)
    assert back.num_rows == 0 and back.num_columns == 2
    # row_group_rows honored for DiskArray sources (was ignored).
    X = nps_app_inst.array(data, block_shape=(60, 3))
    da = nps_app_inst.spill(X, str(tmp_path / "da"))
    pw = str(tmp_path / "rg.parquet")
    nums_tpu.api.write_parquet(da, pw, row_group_rows=25)
    meta = pq.ParquetFile(pw).metadata
    assert meta.row_group(0).num_rows == 25
    assert np.allclose(nums_tpu.read_parquet(pw).get(), data)
