"""nums_tpu.numpy: the NumPy-shaped public surface.

Parity: ``nums/numpy/__init__.py:30-40`` — every numpy callable not yet
implemented is filled with a ``_not_implemented`` stub so user code fails
loudly (pattern the reference borrowed from JAX).
"""

import inspect as _inspect

import numpy as _np

from nums_tpu.numpy import api as _api
from nums_tpu.numpy.api import *  # noqa: F401,F403
from nums_tpu.numpy.extra import *  # noqa: F401,F403
from nums_tpu.numpy.extra2 import *  # noqa: F401,F403
from nums_tpu.numpy.extra3 import *  # noqa: F401,F403
from nums_tpu.numpy.extra4 import *  # noqa: F401,F403
from nums_tpu.numpy.compat import *  # noqa: F401,F403
from nums_tpu.numpy.tail import *  # noqa: F401,F403
from nums_tpu.numpy.api import _not_implemented
from nums_tpu.numpy import linalg  # noqa: F401
from nums_tpu.numpy import random  # noqa: F401
from nums_tpu.numpy import fft  # noqa: F401
from nums_tpu.core.array.blockarray import BlockArray  # noqa: F401


def _fill_missing():
    g = globals()
    for name in _np.__dict__:
        if name.startswith("_") or name in g:
            continue
        obj = _np.__dict__[name]
        if callable(obj) and (
            _inspect.isroutine(obj) or isinstance(obj, _np.ufunc)
        ):
            g[name] = _not_implemented(obj)


_fill_missing()
del _fill_missing
