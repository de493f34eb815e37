"""Tracing/observability tests (aux subsystem, SURVEY §5)."""

import logging

import numpy as np

from nums_tpu.core import trace


def test_op_event_log(app_inst):
    trace.enable(record=True)
    trace.clear()
    try:
        x = app_inst.array(np.ones((8, 4)), block_shape=(4, 4))
        y = x + 1.0
        z = y.sum(axis=0)
        _ = (x.T @ x)
        names = [e[1] for e in trace.events()]
        assert "add" in names
        assert "sum" in names
        assert "tensordot" in names
    finally:
        trace.disable()
    trace.clear()
    # disabled: no recording
    _ = x * 2.0
    assert trace.events() == []


def test_profile_context(app_inst, tmp_path):
    import pytest

    x = app_inst.array(np.ones((16, 4)), block_shape=(8, 4))
    try:
        with trace.profile(str(tmp_path / "prof")):
            (x @ x.T).touch()
    except Exception as e:  # profiler may be unsupported on forced-CPU
        pytest.skip(f"profiler unavailable: {e}")
    with trace.annotate("region"):
        (x + 1).touch()