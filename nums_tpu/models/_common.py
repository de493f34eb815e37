"""Shared helpers for the models package."""

import numpy as np

from nums_tpu.core.application_manager import instance as _instance
from nums_tpu.core.array.blockarray import BlockArray


def _to_ba(x):
    """Anything array-like → BlockArray on the active application."""
    if isinstance(x, BlockArray):
        return x
    return _instance().array(np.asarray(x), block_shape=None)


def save_model_arrays(path: str, meta: dict, arrays: dict):
    """Persist a fitted model: ``model.json`` (hyperparams + scalars) +
    ``arrays.npz`` (fitted tensors), written atomically (tmp + rename).
    The format every non-GLM model's save/load shares."""
    import json
    import os
    import shutil

    from nums_tpu.core.io.filesystem import _fs_path

    path = _fs_path(path)
    tmp = f"{path}.tmp-{os.getpid()}"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    host = {
        k: (np.asarray(v.get()) if hasattr(v, "get") else np.asarray(v))
        for k, v in arrays.items() if v is not None
    }
    np.savez(os.path.join(tmp, "arrays.npz"), **host)
    with open(os.path.join(tmp, "model.json"), "w") as f:
        json.dump(meta, f)
    # Publish via rename-with-backup (the DiskArray.from_panels
    # pattern): rmtree-then-rename would leave NO model on disk if the
    # process died between the two calls.
    bak = None
    if os.path.isdir(path):
        bak = f"{path}.old-{os.getpid()}"
        if os.path.isdir(bak):
            shutil.rmtree(bak)
        os.rename(path, bak)
    elif os.path.exists(path):
        os.remove(path)  # stale regular file at the target
    try:
        os.rename(tmp, path)
    except BaseException:
        if bak is not None and not os.path.exists(path):
            os.rename(bak, path)  # restore the previous version
        raise
    if bak is not None:
        shutil.rmtree(bak, ignore_errors=True)


def load_model_arrays(path: str):
    """(meta, {name: np.ndarray}) from ``save_model_arrays`` output."""
    import json
    import os

    from nums_tpu.core.io.filesystem import _fs_path

    path = _fs_path(path)
    with open(os.path.join(path, "model.json")) as f:
        meta = json.load(f)
    with np.load(os.path.join(path, "arrays.npz")) as z:
        arrays = {k: z[k] for k in z.files}
    return meta, arrays
