"""DataFrame → BlockArray conversion (reference: nums_modin.py:8-58).

from_pandas is fully testable here (pandas ships in the image);
from_modin degrades to the same path and is gated on modin presence.
"""

import numpy as np
import pandas as pd
import pytest

from nums_tpu.experimental import nums_modin


def test_from_pandas_roundtrip(app_inst):
    rs = np.random.RandomState(0)
    df = pd.DataFrame(rs.randn(40, 5), columns=list("abcde"))
    ba = nums_modin.from_pandas(df)
    assert ba.shape == (40, 5)
    assert np.allclose(ba.get(), df.to_numpy())


def test_from_pandas_series_and_dtype(app_inst):
    s = pd.Series(np.arange(10.0))
    ba = nums_modin.from_pandas(s)
    assert ba.shape == (10, 1)
    df = pd.DataFrame({"a": [1, 2, 3], "b": ["4", "5", "6"]})
    ba2 = nums_modin.from_pandas(df, dtype=np.float64)
    assert ba2.dtype == np.float64
    assert np.allclose(ba2.get(), [[1, 4], [2, 5], [3, 6]])


def test_from_row_parts_streams_partitions(app_inst):
    """Partition-wise assembly matches concatenation and is sharded under
    the mesh (mirrors the reference's per-partition from_oid)."""
    rs = np.random.RandomState(1)
    parts = [rs.randn(r, 4) for r in (10, 7, 15)]
    ba = nums_modin._from_row_parts(parts, block_shape=(4, 4))
    assert ba.shape == (32, 4)
    assert np.allclose(ba.get(), np.concatenate(parts, axis=0))
    from nums_tpu.core.backend import MeshBackend

    if isinstance(app_inst.backend, MeshBackend):
        # multi-block grid ⇒ row-sharded at rest (per-partition regions
        # landed straight into their shards)
        assert not ba.raw.sharding.is_fully_replicated


def test_from_modin_gated():
    if nums_modin._HAS_MODIN:
        pytest.skip("modin installed: gating not applicable")
    with pytest.raises(RuntimeError, match="modin is not available"):
        nums_modin.from_modin(None)


def test_from_row_parts_ragged_columns_2d_mesh():
    """Column axis padded by pad-and-mask (d=5 on a 2-wide mesh axis):
    region assembly must allocate at PHYSICAL width — a logical-width
    buffer clamps the shard's column slice (round-2 review fix)."""
    import jax

    from nums_tpu.core import application_manager
    from nums_tpu.core.array.application import ArrayApplication
    from nums_tpu.core.backend import MeshBackend

    devices = jax.devices("cpu")[:8]
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    backend = MeshBackend(cluster_shape=(4, 2), devices=devices).init()
    app = ArrayApplication(backend)
    old = (application_manager.instance()
           if application_manager.is_initialized() else None)
    application_manager.set_instance(app)
    try:
        rs = np.random.RandomState(2)
        parts = [rs.randn(r, 5) for r in (9, 8, 7)]
        ba = nums_modin._from_row_parts(parts, block_shape=(4, 3))
        assert ba.shape == (24, 5)
        # Physical buffer is column-padded; logical values are exact.
        assert ba.raw.shape[1] >= 5
        assert np.allclose(ba.get(), np.concatenate(parts, axis=0))
    finally:
        if old is not None:
            application_manager.set_instance(old)
