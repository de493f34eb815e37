"""Explicit SUMMA GEMM vs oracle on the 8-device virtual mesh."""

import numpy as np
import pytest

from nums_tpu.core.backend import MeshBackend


@pytest.fixture(scope="module")
def mesh_backend():
    return MeshBackend(cluster_shape=(4, 2)).init()


def test_summa_matches_numpy(mesh_backend):
    from nums_tpu.core.ops import summa

    rs = np.random.RandomState(0)
    a = rs.randn(16, 8)
    b = rs.randn(8, 6)
    assert summa.supported(mesh_backend, a.shape, b.shape)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_backend.mesh
    aj = jax.device_put(a, NamedSharding(mesh, P("m0", "m1")))
    bj = jax.device_put(b, NamedSharding(mesh, P("m0", "m1")))
    c = summa.summa_matmul(mesh_backend)(aj, bj)
    assert np.allclose(np.asarray(c), a @ b)
    # output is sharded over the full mesh
    assert c.sharding.num_devices == 8


def test_summa_supported_predicate(mesh_backend):
    from nums_tpu.core.ops import summa

    assert not summa.supported(mesh_backend, (15, 8), (8, 6))  # m % 4 != 0
    assert not summa.supported(mesh_backend, (16, 7), (7, 6))  # k checks
    assert not summa.supported(mesh_backend, (16, 8), (8, 5))  # n % 2 != 0
    from nums_tpu.core.backend import SerialBackend

    assert not summa.supported(SerialBackend().init(), (16, 8), (8, 6))

def test_ring_matmul_matches_numpy(mesh_backend):
    from nums_tpu.core.ops import summa

    rs = np.random.RandomState(1)
    a = rs.randn(16, 12)
    b = rs.randn(12, 5)
    assert summa.ring_supported(mesh_backend, a.shape, b.shape)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_backend.mesh
    aj = jax.device_put(a, NamedSharding(mesh, P("m0", None)))
    bj = jax.device_put(b, NamedSharding(mesh, P("m0", None)))
    c = summa.ring_matmul(mesh_backend)(aj, bj)
    assert np.allclose(np.asarray(c), a @ b)


def test_ring_matmul_1d_mesh():
    from nums_tpu.core.ops import summa

    be = MeshBackend(cluster_shape=(8,)).init()
    rs = np.random.RandomState(2)
    a = rs.randn(24, 16)
    b = rs.randn(16, 6)
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    aj = jax.device_put(a, NamedSharding(be.mesh, P("m0", None)))
    bj = jax.device_put(b, NamedSharding(be.mesh, P("m0", None)))
    c = summa.ring_matmul(be)(aj, bj)
    assert np.allclose(np.asarray(c), a @ b)
