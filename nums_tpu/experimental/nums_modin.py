"""Modin DataFrame → BlockArray conversion.

Parity target: ``nums/experimental/nums_modin.py:8-58``. The reference
zero-copies Modin's Ray partitions via ``from_oid``; without a shared
object store the TPU equivalent materializes partitions host-side and
device_puts them into the sharded array.

modin is not bundled in this environment; import-safe, raises at use.
"""

import numpy as np

from nums_tpu.core.application_manager import instance as _instance

try:  # pragma: no cover
    import modin.pandas as _mpd

    _HAS_MODIN = True
except Exception:  # pragma: no cover
    _mpd = None
    _HAS_MODIN = False


def from_modin(df):
    if not _HAS_MODIN:
        raise RuntimeError(
            "modin is not available in this environment; install it to use "
            "nums_tpu.experimental.nums_modin."
        )
    app = _instance()
    arr = df.to_numpy()
    if arr.dtype == object:
        arr = arr.astype(np.float64)
    block_shape = app.get_block_shape(arr.shape, arr.dtype)
    return app.array(arr, block_shape=block_shape)
