"""Backend/sharding tests (role of reference tests/core/systems/* —
scheduler placement becomes sharding-spec assertions)."""

import numpy as np
import pytest

from jax.sharding import PartitionSpec

from nums_tpu.core.backend import MeshBackend, SerialBackend
from nums_tpu.core.grid import ArrayGrid


@pytest.fixture(scope="module")
def mesh_backend():
    return MeshBackend(cluster_shape=(4, 2)).init()


def test_spec_rules(mesh_backend):
    b = mesh_backend
    # divisible on both axes -> fully sharded
    assert b.spec_for_shape((8, 4)) == PartitionSpec("m0", "m1")
    # non-divisible axes shard too (pad-and-mask rounds up at rest)
    assert b.spec_for_shape((10, 4)) == PartitionSpec("m0", "m1")
    assert b.physical_shape((10, 4)) == (12, 4)
    assert b.spec_for_shape((8, 3)) == PartitionSpec("m0", "m1")
    assert b.physical_shape((8, 3)) == (8, 4)
    # too-small axis replicated (a device would hold ONLY padding)
    assert b.spec_for_shape((2, 4)) == PartitionSpec(None, "m1")
    assert b.physical_shape((2, 4)) == (2, 4)
    # 1-D arrays shard over the full flattened mesh when divisible
    assert b.spec_for_shape((16,)) == PartitionSpec(("m0", "m1"))
    # 1-D at least mesh-size long -> padded onto the full mesh
    assert b.spec_for_shape((12,)) == PartitionSpec(("m0", "m1"))
    assert b.physical_shape((12,)) == (16,)
    # shorter than the full mesh but at least m0 -> padded onto m0
    assert b.spec_for_shape((7,)) == PartitionSpec("m0")
    assert b.physical_shape((7,)) == (8,)
    # shorter than every mesh axis -> replicated
    assert b.spec_for_shape((3,)) == PartitionSpec(None)
    assert b.physical_shape((3,)) == (3,)
    # single-block grid hint keeps axis replicated
    assert b.spec_for_shape((8, 4), grid_shape=(1, 2)) == PartitionSpec(
        None, "m1"
    )
    assert b.physical_shape((8, 4), grid_shape=(1, 2)) == (8, 4)


def test_spec_rules_pad_disabled(mesh_backend, monkeypatch):
    """NUMS_TPU_PAD_SHARD=0 restores round-1 behavior: ragged replicated."""
    from nums_tpu.core import settings

    monkeypatch.setattr(settings, "pad_shard", False)
    b = mesh_backend
    assert b.spec_for_shape((10, 4)) == PartitionSpec(None, "m1")
    assert b.physical_shape((10, 4)) == (10, 4)
    assert b.spec_for_shape((12,)) == PartitionSpec("m0")
    assert b.spec_for_shape((7,)) == PartitionSpec(None)


def test_creation_is_sharded(mesh_backend):
    from nums_tpu.core.array.application import ArrayApplication

    app = ArrayApplication(mesh_backend)
    x = app.zeros((16, 8), (4, 4), dtype=np.float64)
    shards = x.data.sharding.num_devices
    assert shards == 8
    # every device holds a (4, 4) shard
    addr = x.data.addressable_shards
    assert len(addr) == 8
    assert all(s.data.shape == (4, 4) for s in addr)


def test_sharded_matmul_and_reduction(mesh_backend):
    from nums_tpu.core.array.application import ArrayApplication

    app = ArrayApplication(mesh_backend)
    rs = np.random.RandomState(0)
    x = rs.randn(64, 16)
    bx = app.array(x, block_shape=(8, 8))
    g = (bx.T @ bx).get()
    assert np.allclose(g, x.T @ x)
    assert np.allclose(app.sum(bx, axis=0).get(), x.sum(axis=0))


def test_reblock_changes_sharding(mesh_backend):
    from nums_tpu.core.array.application import ArrayApplication

    app = ArrayApplication(mesh_backend)
    x = app.ones((16, 6), (4, 6), dtype=np.float64)  # axis1 replicated
    # axis1 still indivisible by 2? 6 % 2 == 0 -> sharded after reblock hint
    y = x.reshape(block_shape=(4, 3))
    assert y.block_shape == (4, 3)
    assert np.allclose(y.get(), 1.0)


def test_serial_backend_basics():
    b = SerialBackend().init()
    grid = ArrayGrid((4, 4), (2, 2), "float64")
    arr = b.device_put(np.ones((4, 4)), grid)
    assert b.get(arr).shape == (4, 4)
    assert b.num_devices == 1


def test_mesh_requires_enough_devices():
    with pytest.raises(AssertionError):
        MeshBackend(cluster_shape=(64, 64)).init()


def test_ragged_shapes_on_mesh(mesh_backend):
    """Non-divisible shapes replicate (pad-and-mask is roadmapped) but must
    stay CORRECT end-to-end on the mesh."""
    from nums_tpu.core.array.application import ArrayApplication

    app = ArrayApplication(mesh_backend)
    rs = np.random.RandomState(0)
    x = rs.randn(998, 7)  # neither axis divides the (4,2) mesh
    bx = app.array(x, block_shape=(250, 7))
    assert np.allclose((bx.T @ bx).get(), x.T @ x)
    assert np.allclose(app.sum(bx, axis=0).get(), x.sum(axis=0))
    q, r = app.direct_tsqr(bx)
    assert np.allclose(q.get() @ r.get(), x, atol=1e-9)
    y = rs.randn(998)
    by = app.array(y, block_shape=(250,))
    theta = app.linear_regression(bx, by)
    assert theta.shape == (7,)
