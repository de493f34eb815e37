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


def test_ring_matmul_double_buffered(mesh_backend):
    """Numerics of the overlapped (double-buffered ppermute) ring."""
    import jax
    from nums_tpu.core.ops import summa

    rs = np.random.RandomState(3)
    p = mesh_backend.device_grid.mesh_shape[0]
    a = rs.randn(8 * p, 4 * p)
    b = rs.randn(4 * p, 6)
    assert summa.ring_supported(mesh_backend, a.shape, b.shape)
    aj = jax.device_put(a)
    bj = jax.device_put(b)
    c = summa.ring_matmul(mesh_backend)(aj, bj)
    assert np.allclose(np.asarray(c), a @ b)


@pytest.mark.parametrize("mode", ["ring", "summa"])
def test_collective_matmul_wired_into_tensordot(mode, monkeypatch):
    """NUMS_TPU_COLLECTIVE_MATMUL routes BlockArray @ through the
    hand-scheduled kernels; unsupported shapes fall back silently."""
    from nums_tpu.core import settings
    from nums_tpu.core import application_manager

    monkeypatch.setattr(settings, "collective_matmul", mode)
    monkeypatch.setattr(settings, "backend_name", "mesh")
    application_manager.destroy()
    app = application_manager.create()
    try:
        rs = np.random.RandomState(4)
        ms = app.backend.device_grid.mesh_shape
        m = 4 * ms[0]
        k = 4 * ms[0] * (ms[1] if len(ms) > 1 else 1)
        n = 6 * (ms[1] if len(ms) > 1 else 1)
        a = rs.randn(m, k)
        b = rs.randn(k, n)
        ba = app.array(a, block_shape=(m // ms[0], k))
        bb = app.array(b, block_shape=(k // ms[0], n))
        assert np.allclose((ba @ bb).get(), a @ b)
        # Transposed-left (TN, the x.T@x pattern): hand-scheduled
        # local-GEMM + reduce-scatter path, no fallback.
        from nums_tpu.core.ops import summa

        calls = []
        orig_tn, orig_nt = summa.tn_matmul, summa.nt_matmul
        monkeypatch.setattr(
            summa, "tn_matmul",
            lambda *a, **kw: calls.append("tn") or orig_tn(*a, **kw),
        )
        monkeypatch.setattr(
            summa, "nt_matmul",
            lambda *a, **kw: calls.append("nt") or orig_nt(*a, **kw),
        )
        at = rs.randn(k, m)
        bat = app.array(at, block_shape=(k // ms[0], m))
        assert np.allclose((bat.T @ bb).get(), at.T @ b)
        assert "tn" in calls
        # Transposed-right (NT): all-gathered B panel, transpose fused
        # into the local GEMM.
        bt = rs.randn(n * ms[0], k)  # n must divide mesh axis 0 for NT
        bbt = app.array(bt, block_shape=(n, k))
        assert np.allclose((ba @ bbt.T).get(), a @ bt.T)
        assert "nt" in calls
        # TT: NN schedule on the swapped raws, result lazily transposed.
        tt = (bat.T @ bbt.T)
        assert np.allclose(tt.get(), at.T @ bt.T)
        # Ragged shapes ride the collective path too: at-rest pads are
        # zero-filled, contributing zero to every contraction.
        ar = rs.randn(m + 1, k)
        bar = app.array(ar, block_shape=((m + 1 + ms[0] - 1) // ms[0], k))
        assert np.allclose((bar @ bb).get(), ar @ b)
    finally:
        application_manager.destroy()


def test_collective_microbench_harness(tmp_path, monkeypatch):
    """The ring-vs-auto microbench harness (scripts/benchmark_collective)
    runs end to end on the virtual mesh and records every schedule's
    column — the scaffold the real-ICI tuning round starts from."""
    import csv
    import sys

    from nums_tpu.core import settings
    from nums_tpu.core import application_manager

    monkeypatch.setattr(settings, "backend_name", "mesh")
    application_manager.destroy()
    try:
        sys.path.insert(0, ".")
        from scripts.benchmark_collective import main

        out = tmp_path / "collective.csv"
        assert main(["--sizes", "64,96", "--reps", "1",
                     "--out", str(out)]) == 0
        with open(out) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        for row in rows:
            assert float(row["auto_s"]) > 0
            assert float(row["ring_s"]) > 0
            assert float(row["tn_s"]) > 0
    finally:
        application_manager.destroy()


@pytest.mark.parametrize("mode", ["ring", "summa"])
def test_collective_matmul_ragged_creation_ops(mode, monkeypatch):
    """Advisor r3 high finding: creation ops (ones/full/eye/arange) used
    to fill the WHOLE physical buffer, leaving non-zero at-rest pads that
    the pad-blind collective kernels summed into the result. Creation now
    generates at the logical shape and zero-pads, so ragged arrays from
    any constructor are safe under NUMS_TPU_COLLECTIVE_MATMUL."""
    from nums_tpu.core import settings
    from nums_tpu.core import application_manager

    monkeypatch.setattr(settings, "collective_matmul", mode)
    monkeypatch.setattr(settings, "backend_name", "mesh")
    application_manager.destroy()
    app = application_manager.create()
    try:
        p = app.backend.device_grid.mesh_shape[0]
        m = 4 * p + 1  # ragged: pad rows exist at rest
        bs = ((m + p - 1) // p, 8)
        A = app.ones((m, 8), block_shape=bs)
        oracle = np.ones((m, 8))
        assert np.allclose((A.T @ A).get(), oracle.T @ oracle)
        F = app.full((m, 8), bs, 3.0)
        of = np.full((m, 8), 3.0)
        assert np.allclose((F.T @ F).get(), of.T @ of)
        # eye with the diagonal running through the pad rows
        E = app.eye_k((m, m + 8), ((m + p - 1) // p, m + 8))
        oe = np.eye(m, m + 8)
        assert np.allclose((E @ E.T).get(), oe @ oe.T)
        ar = app.arange((m,), ((m + p - 1) // p,)).astype(np.float64)
        oar = np.arange(m, dtype=np.float64)
        assert np.allclose(ar.T.tensordot(ar, axes=1).get(), oar @ oar)
    finally:
        application_manager.destroy()


def test_creation_pads_are_zero(monkeypatch):
    """The at-rest invariant itself: physical buffers of ragged arrays
    from every constructor have ZERO pads."""
    from nums_tpu.core import settings
    from nums_tpu.core import application_manager

    monkeypatch.setattr(settings, "backend_name", "mesh")
    application_manager.destroy()
    app = application_manager.create()
    try:
        p = app.backend.device_grid.mesh_shape[0]
        m = 4 * p + 1
        bs = ((m + p - 1) // p, 8)
        for arr, logical in [
            (app.ones((m, 8), block_shape=bs), np.ones((m, 8))),
            (app.full((m, 8), bs, 7.5), np.full((m, 8), 7.5)),
            (app.eye_k((m, m + 8), ((m + p - 1) // p, m + 8)),
             np.eye(m, m + 8)),
        ]:
            phys = np.asarray(arr.raw)
            if phys.shape == logical.shape:
                continue
            expect = np.zeros(phys.shape)
            expect[tuple(slice(0, d) for d in logical.shape)] = logical
            assert np.array_equal(phys, expect), (
                f"non-zero pads at physical shape {phys.shape}"
            )
    finally:
        application_manager.destroy()


def test_auto_choose_schedule_per_shape(mesh_backend):
    """The ``auto`` cost model picks the documented schedule per
    (transpose pattern, shape) — VERDICT r3 #4's dispatch scaffold."""
    from nums_tpu.core.backend import SerialBackend
    from nums_tpu.core.ops import summa

    p = mesh_backend.device_grid.mesh_shape[0]
    ch = summa.choose_schedule
    # TN (x.T @ x headline): one reduce-scatter — always chosen while
    # the per-device (m, n) partial fits the budget.
    assert ch(mesh_backend, True, False, (8 * p, 4 * p), (8 * p, 6)) == "tn"
    # ... but not past AUTO_TN_MAX_PARTIAL_BYTES (m*n too large).
    big = 16384  # 16384^2 * 4B = 1 GiB partial
    assert big % p == 0
    assert ch(mesh_backend, True, False, (8 * p, big), (8 * p, big)) is None
    # NT: all-gathered B panel within budget.
    assert ch(mesh_backend, False, True, (4 * p, 8), (3 * p, 8)) == "nt"
    nbig, kbig = 8192 * p, 8192  # n*k*4B = 1 GiB gather
    assert ch(
        mesh_backend, False, True, (4 * p, kbig), (nbig, kbig)
    ) is None
    # NN small: XLA's fused all-gather+GEMM wins -> None.
    assert ch(mesh_backend, False, False, (4 * p, 8 * p), (8 * p, 6)) is None
    # NN past the gather budget on the 2-D mesh: SUMMA.
    k2, n2 = 8192 * p, 16384  # k*n*4B = 2 GiB > budget
    assert ch(mesh_backend, False, False, (4 * p, k2), (k2, n2)) == "summa"
    # Same shapes on a 1-D mesh (no second axis): ring, provided the
    # per-step k-panel amortizes the ppermute hop.
    be1 = MeshBackend(cluster_shape=(8,)).init()
    assert ch(be1, False, False, (8, k2), (k2, n2)) == "ring"
    assert k2 // 8 >= summa.AUTO_RING_MIN_K_PANEL
    # Below AUTO_RING_MIN_K_PANEL the hop latency dominates -> None.
    ksmall = 8 * (summa.AUTO_RING_MIN_K_PANEL - 8)
    nbig2 = (summa.AUTO_NN_GATHER_BUDGET_BYTES // (4 * ksmall)) + 8
    nbig2 -= nbig2 % 8
    assert ch(be1, False, False, (8, ksmall), (ksmall, nbig2)) is None
    # TT = NN on the swapped raws.
    assert ch(be1, True, True, (k2, n2), (8, k2)) == "ring"
    # Serial backend: never.
    assert ch(SerialBackend().init(), True, False,
              (8 * p, 4 * p), (8 * p, 6)) is None


def test_auto_mode_end_to_end(monkeypatch):
    """NUMS_TPU_COLLECTIVE_MATMUL=auto routes the headline x.T@x through
    the TN kernel and falls back to XLA for small NN — asserted via the
    LAST_DISPATCH hook, with numerics checked against the oracle."""
    from nums_tpu.core import application_manager, settings
    from nums_tpu.core.ops import summa

    monkeypatch.setattr(settings, "collective_matmul", "auto")
    monkeypatch.setattr(settings, "backend_name", "mesh")
    application_manager.destroy()
    app = application_manager.create()
    try:
        rs = np.random.RandomState(6)
        p = app.backend.device_grid.mesh_shape[0]
        x = rs.randn(8 * p, 4 * p)
        bx = app.array(x, block_shape=(8, 4 * p))
        summa.LAST_DISPATCH = None
        assert np.allclose((bx.T @ bx).get(), x.T @ x)
        assert summa.LAST_DISPATCH == "tn"
        # Ragged rows ride the same dispatch (zero-filled at-rest pads).
        xr = rs.randn(8 * p + 1, 4 * p)
        bxr = app.array(xr, block_shape=(9, 4 * p))
        summa.LAST_DISPATCH = None
        assert np.allclose((bxr.T @ bxr).get(), xr.T @ xr)
        assert summa.LAST_DISPATCH == "tn"
        # Small NN: auto declines, XLA partitions, result still right.
        b = rs.randn(4 * p, 6)
        bb = app.array(b, block_shape=(4, 6))
        summa.LAST_DISPATCH = None
        assert np.allclose((bx @ bb).get(), x @ b)
        assert summa.LAST_DISPATCH == "xla"
    finally:
        application_manager.destroy()


def test_tn_nt_kernels_match_numpy(mesh_backend):
    """Direct kernel-level oracle for the transposed-operand schedules."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nums_tpu.core.ops import summa

    rs = np.random.RandomState(5)
    p = mesh_backend.device_grid.mesh_shape[0]
    mesh = mesh_backend.mesh
    # TN: Araw (K, m), B (K, n) -> Araw.T @ B
    a_raw = rs.randn(8 * p, 4 * p)
    b = rs.randn(8 * p, 6)
    assert summa.tn_supported(mesh_backend, a_raw.shape, b.shape)
    aj = jax.device_put(a_raw, NamedSharding(mesh, P("m0", None)))
    bj = jax.device_put(b, NamedSharding(mesh, P("m0", None)))
    c = summa.tn_matmul(mesh_backend)(aj, bj)
    assert np.allclose(np.asarray(c), a_raw.T @ b)
    # NT: A (m, K), Braw (n, K) -> A @ Braw.T
    a2 = rs.randn(4 * p, 7)
    b_raw = rs.randn(3 * p, 7)
    assert summa.nt_supported(mesh_backend, a2.shape, b_raw.shape)
    aj2 = jax.device_put(a2, NamedSharding(mesh, P("m0", None)))
    bj2 = jax.device_put(b_raw, NamedSharding(mesh, P("m0", None)))
    c2 = summa.nt_matmul(mesh_backend)(aj2, bj2)
    assert np.allclose(np.asarray(c2), a2 @ b_raw.T)
