"""In-process unit tests for core/multiprocess (the real cross-process
behavior is e2e-tested by tests/test_multihost.py in jax.distributed
subprocesses, which line coverage can't see — these cover the
single-process contracts every call site relies on)."""

import numpy as np
import pytest

from nums_tpu.core import multiprocess as mp


def test_single_process_identities():
    assert mp.process_count() == 1
    assert mp.process_index() == 0
    assert not mp.is_multiprocess()


def test_initialize_noop_without_env(monkeypatch):
    monkeypatch.delenv("NUMS_TPU_COORDINATOR", raising=False)
    assert mp.initialize() is False


def test_allgather_and_barrier_single_process():
    import jax.numpy as jnp

    x = jnp.arange(12.0).reshape(3, 4)
    got = mp.allgather_to_host(x)
    assert isinstance(got, np.ndarray)
    assert np.array_equal(got, np.arange(12.0).reshape(3, 4))
    mp.barrier("unit-test")  # trivially passes with one process


@pytest.mark.parametrize("backend_name", ["serial", "mesh"])
def test_owned_regions_cover_array_exactly_once(backend_name):
    """Every element belongs to exactly one owned region (the
    no-double-write invariant checkpoint writers depend on)."""
    from nums_tpu.core import application_manager, settings

    old = settings.backend_name
    settings.backend_name = backend_name
    application_manager.destroy()
    app = application_manager.create()
    try:
        x = np.arange(56.0).reshape(14, 4)
        ba = app.array(x, block_shape=(2, 4))
        regions = mp.owned_regions(ba.raw)
        hit = np.zeros(ba.raw.shape, np.int32)
        for index, data in regions:
            assert np.array_equal(np.asarray(ba.raw)[index], data)
            hit[index] += 1
        assert np.all(hit == 1), hit  # exact single-owner tiling
        # Replicated arrays (0-d / fully-replicated shards) still have
        # exactly one owner.
        s = app.array(np.float64(7.0), block_shape=())
        regs = mp.owned_regions(s.raw)
        assert len(regs) == 1 and float(regs[0][1]) == 7.0
    finally:
        application_manager.destroy()
        settings.backend_name = old
        application_manager.create()
