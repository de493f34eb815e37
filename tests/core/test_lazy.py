"""Lazy expression-batching engine tests (SURVEY hard-part #7).

The contract: op chains defer; a sync point compiles the WHOLE chain as
one structurally-cached program; value changes never retrace; interior
values stay fused (not returned to HBM); forcing is idempotent.
"""

import numpy as np
import pytest

from nums_tpu.core import lazy, settings
from nums_tpu.core.array.blockarray import BlockArray


@pytest.fixture(autouse=True)
def _require_lazy():
    if not settings.lazy_batch:
        pytest.skip("lazy batching disabled via NUMS_TPU_LAZY=0")


def test_ops_defer_and_force(app_inst):
    x = np.arange(12, dtype=float).reshape(3, 4)
    bx = app_inst.array(x, block_shape=(3, 4))
    z = (bx + 1.0) * 2.0
    assert isinstance(z._data, lazy.LazyOut)
    assert z.shape == (3, 4)  # metadata without materializing
    assert isinstance(z._data, lazy.LazyOut)  # still deferred
    assert np.allclose(z.get(), (x + 1.0) * 2.0)
    assert not isinstance(z._data, lazy.LazyOut)  # forced + cached


def test_program_cache_no_retrace(app_inst):
    x = np.arange(20, dtype=float)
    bx = app_inst.array(x, block_shape=(5,))
    before = len(lazy._compiled)
    vals = []
    for c in (1.5, 2.5, 3.5):  # same structure, different scalar values
        vals.append(float(((bx * c) + c).sum().get()))
    after = len(lazy._compiled)
    assert after - before <= 1
    for c, v in zip((1.5, 2.5, 3.5), vals):
        assert np.isclose(v, ((x * c) + c).sum())


def test_shared_subexpression_and_sibling_roots(app_inst):
    x = np.arange(8, dtype=float)
    bx = app_inst.array(x, block_shape=(4,))
    s = bx + 1.0
    a = (s * 2.0).sum()
    b = (s - 3.0).sum()
    assert np.isclose(float(a.get()), ((x + 1) * 2).sum())
    assert np.isclose(float(b.get()), ((x + 1) - 3).sum())
    # forcing s later is still correct (recompute or cached)
    assert np.allclose(s.get(), x + 1)


def test_multi_output_kernels_defer(app_inst):
    rs = np.random.RandomState(0)
    x = rs.randn(32, 4)
    bx = app_inst.array(x, block_shape=(8, 4))
    q, r = app_inst.direct_tsqr(bx * 1.0)
    assert np.allclose((q @ r).get(), x, atol=1e-10)


def test_depth_cap_forces(app_inst, monkeypatch):
    monkeypatch.setattr(settings, "lazy_max_depth", 4)
    x = np.ones(8)
    bx = app_inst.array(x, block_shape=(4,))
    z = bx
    for _ in range(20):
        z = z + 1.0
    assert isinstance(z._data, lazy.LazyOut)
    assert z._data.call.depth <= 4
    assert np.allclose(z.get(), x + 20.0)


def test_duplicate_leaf_deduped(app_inst):
    """x used twice in one expression must enter the program ONCE
    (duplicate jit args double-count HBM through this PJRT transport)."""
    x = np.arange(6, dtype=float)
    bx = app_inst.array(x, block_shape=(3,))
    bx.touch()
    z = bx * bx + bx
    out = lazy.materialize(z._data) if isinstance(z._data, lazy.LazyOut) else z._data
    assert np.allclose(np.asarray(z.get()), x * x + x)


def test_lazy_interplay_with_setitem_and_indexing(app_inst):
    x = np.arange(24, dtype=float).reshape(6, 4)
    bx = app_inst.array(x, block_shape=(3, 4))
    z = bx + 1.0
    z[0, 0] = 100.0  # setitem is a sync point
    e = x + 1.0
    e[0, 0] = 100.0
    assert np.allclose(z.get(), e)
    w = (bx * 2.0)[1:4]
    assert np.allclose(w.get(), (x * 2.0)[1:4])


def test_lazy_transpose_chain(app_inst):
    rs = np.random.RandomState(1)
    x = rs.randn(16, 8)
    bx = app_inst.array(x, block_shape=(4, 8))
    g = (bx + 0.5).T @ (bx + 0.5)
    assert np.allclose(g.get(), (x + 0.5).T @ (x + 0.5))


def test_eager_mode_flag(app_inst, monkeypatch):
    monkeypatch.setattr(settings, "lazy_batch", False)
    x = np.arange(10, dtype=float)
    bx = app_inst.array(x, block_shape=(5,))
    z = bx * 3.0
    assert not isinstance(z._data, lazy.LazyOut)
    assert np.allclose(z.get(), x * 3.0)


def test_sibling_consumer_reuses_interior(app_inst):
    """An interior value with NO live handle but a pending sibling
    consumer is stored at the first materialization (not recomputed per
    root) — the consumer-tracking upgrade over handle-only liveness."""
    x = np.arange(8, dtype=float)
    bx = app_inst.array(x, block_shape=(4,))
    tmp = bx * 2.0
    c1 = tmp + 1.0
    c2 = tmp - 1.0
    tmp_call = c1._data.call.args[0].call  # the interior (bx*2) call
    del tmp  # no live BlockArray handle for the interior
    assert np.allclose(c1.get(), x * 2.0 + 1.0)
    # First materialization stored the interior for the pending sibling.
    assert tmp_call.results is not None
    interior = tmp_call.results[0]
    assert np.allclose(np.asarray(interior), x * 2.0)
    assert np.allclose(c2.get(), x * 2.0 - 1.0)


def test_dead_interior_stays_fused(app_inst):
    """With no handle AND no pending consumer, an interior value is never
    returned to HBM (fusion preserved)."""
    x = np.arange(8, dtype=float)
    bx = app_inst.array(x, block_shape=(4,))
    tmp = bx * 2.0
    c1 = tmp + 1.0
    tmp_call = c1._data.call.args[0].call
    del tmp
    assert np.allclose(c1.get(), x * 2.0 + 1.0)
    assert tmp_call.results is None  # stayed fused inside the program


def test_materialized_call_releases_args(app_inst):
    """After a call's results are stored, its argument references are
    dropped so upstream leaf buffers are not pinned."""
    x = np.arange(8, dtype=float)
    bx = app_inst.array(x, block_shape=(4,))
    z = bx + 1.0
    call = z._data.call
    assert len(call.args) > 0
    z.get()
    assert call.results is not None
    assert call.args == ()


def test_leaf_sharing_in_program_key(app_inst):
    """Two graphs identical in structure and leaf avals but different in
    leaf SHARING (f(a,a) vs f(a,b)) must not share a compiled executor —
    regression test for a silent-wrong-values key collision."""
    x = np.arange(8, dtype=float)
    a = app_inst.array(x, block_shape=(4,))
    b = app_inst.array(x + 100.0, block_shape=(4,))
    v1 = float((a * a).sum().get())  # both args share one leaf
    v2 = float((a * b).sum().get())  # same avals, two distinct leaves
    assert np.isclose(v1, (x * x).sum())
    assert np.isclose(v2, (x * (x + 100.0)).sum())


def test_program_cache_is_bounded(app_inst):
    """The executor/aval caches evict LRU past settings.lazy_program_cache
    instead of growing forever on structurally-unique graph streams."""
    from nums_tpu.core import lazy, settings

    old = settings.lazy_program_cache
    settings.lazy_program_cache = 8
    try:
        x = np.arange(16, dtype=float)
        bx = app_inst.array(x, block_shape=(8,))
        for k in range(1, 24):
            # Each k yields a different chain length -> unique key.
            z = bx
            for _ in range(k):
                z = z + 1.0
            assert np.isclose(float(z.sum().get()), (x + k).sum())
        assert len(lazy._compiled) <= 8
        assert len(lazy._eval_memo) <= 64
        # A stable workload still hits the cache after eviction churn.
        before = len(lazy._compiled)
        float((bx + 1.0).sum().get())
        float((bx + 1.0).sum().get())
        assert len(lazy._compiled) >= 1 and len(lazy._compiled) <= 8
        del before
    finally:
        settings.lazy_program_cache = old
