"""App lifecycle tests (parity: reference tests/core/test_app_manager.py:26-37)."""

import numpy as np

from nums_tpu.core import settings, application_manager


def test_create_destroy_cycles():
    for backend_name in ["serial", "mesh", "serial"]:
        settings.backend_name = backend_name
        application_manager.destroy()
        assert not application_manager.is_initialized()
        app = application_manager.instance()
        assert application_manager.is_initialized()
        assert app.backend.name == backend_name
        x = app.array(np.arange(8).astype(float), block_shape=(4,))
        assert float(app.sum(x)) == 28.0
        application_manager.destroy()
        assert not application_manager.is_initialized()


def test_unknown_backend_raises():
    import pytest

    settings.backend_name = "nope"
    application_manager.destroy()
    with pytest.raises(ValueError):
        application_manager.instance()
    settings.backend_name = "serial"
    application_manager.destroy()
