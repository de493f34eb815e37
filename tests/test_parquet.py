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
