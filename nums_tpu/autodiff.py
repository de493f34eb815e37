"""Automatic differentiation THROUGH the distributed NumPy API.

A capability with no reference analogue: the reference's per-block Ray
tasks are opaque to any autodiff system, but here every BlockArray
operation is a pure jitted kernel recorded in the lazy engine's DAG —
so a user function written against the public API (facade ops,
operators, reductions, linalg) is differentiable end to end:

    import nums_tpu
    from nums_tpu import autodiff

    def loss(beta):                      # plain nums_tpu code
        r = X @ beta - y
        return (r * r).sum()

    g = autodiff.grad(loss)(beta)        # BlockArray gradient
    val, g = autodiff.value_and_grad(loss)(beta)

The whole forward DAG plus its transpose compile as ONE XLA program per
structure (cached like any lazy program); under a mesh the gradient
inherits the forward shardings. Requires lazy batching
(``NUMS_TPU_LAZY=1``, the default): a host sync inside ``f`` (``.get``,
``float()``, boolean tests) severs the recorded graph, and reaching a
``wrt`` argument through a severed graph raises with an explanation.
"""

import jax
import numpy as np

from nums_tpu.core import lazy, settings
from nums_tpu.core.array.blockarray import BlockArray

__all__ = ["grad", "value_and_grad", "hvp", "check_grad"]

# (program key, argnums) -> jitted value_and_grad executor (shares the
# lazy cache's LRU policy).
_vag_cache = lazy._compiled  # same bounded store, distinct key tag


def _normalize_argnums(argnums):
    if isinstance(argnums, int):
        return (argnums,), True
    return tuple(argnums), False


def value_and_grad(f, argnums=0):
    """``wrapped(*args) -> (value, grads)`` for a scalar-valued ``f``
    written against the BlockArray/facade API.

    ``argnums`` selects which positional BlockArray arguments to
    differentiate with respect to (int or tuple). The value is a scalar
    BlockArray; each gradient is a BlockArray with the argument's grid.
    """
    nums, single = _normalize_argnums(argnums)

    def wrapped(*args, **kwargs):
        if not settings.lazy_batch:
            raise RuntimeError(
                "autodiff requires lazy batching (NUMS_TPU_LAZY=1): the "
                "gradient is computed by transposing the recorded op DAG."
            )
        wrt = []
        for i in nums:
            a = args[i]
            assert isinstance(a, BlockArray), (
                f"argnums={i} must be a BlockArray, got {type(a)}"
            )
            a.touch()  # concrete buffer == the DAG leaf identity
            wrt.append(a)
        out = f(*args, **kwargs)
        assert isinstance(out, BlockArray) and out.shape == (), (
            "f must return a SCALAR BlockArray (shape ()); got "
            f"{getattr(out, 'shape', type(out))}"
        )
        root = out._data
        if not isinstance(root, lazy.LazyOut):
            raise RuntimeError(
                "f's output is already materialized — a host sync inside "
                "f (get/float/bool/...) severed the recorded graph before "
                "the gradient could be taken."
            )
        run_root, leaves, leaf_pos, key = lazy.program_for(root)
        idxs = []
        for i, a in zip(nums, wrt):
            li = leaf_pos.get(id(a.raw))
            if li is None:
                raise RuntimeError(
                    f"argument {i} is not reachable in f's recorded op "
                    "graph — either the output does not depend on it, or "
                    "a host sync inside f severed the chain at an "
                    "intermediate value."
                )
            idxs.append(li)
        cache_key = ("vag", key, tuple(idxs))
        executor = _vag_cache.get(cache_key)
        if executor is not None:
            _vag_cache.move_to_end(cache_key)
        else:
            executor = jax.jit(
                jax.value_and_grad(run_root, argnums=tuple(idxs))
            )
            lazy._lru_put(
                _vag_cache, cache_key, executor,
                settings.lazy_program_cache,
            )
        val, grads = executor(*leaves)
        backend = wrt[0].backend
        val_ba = BlockArray.from_jax(val, backend=backend)
        grad_bas = tuple(
            BlockArray(g, a.grid.copy(), a.backend,
                       transposed=a.is_transposed)
            for g, a in zip(grads, wrt)
        )
        return val_ba, (grad_bas[0] if single else grad_bas)

    return wrapped


def grad(f, argnums=0):
    """Gradient-only variant of :func:`value_and_grad`."""
    vag = value_and_grad(f, argnums=argnums)

    def wrapped(*args, **kwargs):
        return vag(*args, **kwargs)[1]

    return wrapped


def hvp(f, argnums=0):
    """Hessian-vector product: ``wrapped(*args, v) -> BlockArray``
    computing ∂²f · v for a single differentiated argument — forward-
    over-reverse on the recorded DAG, one compiled program."""
    nums, single = _normalize_argnums(argnums)
    assert single, "hvp supports a single argnum"
    (i,) = nums

    def wrapped(*args_and_v, **kwargs):
        *args, v = args_and_v
        a = args[i]
        assert isinstance(a, BlockArray) and isinstance(v, BlockArray)
        assert v.shape == a.shape, (v.shape, a.shape)
        a.touch()
        v.touch()
        out = f(*args, **kwargs)
        assert isinstance(out, BlockArray) and out.shape == ()
        root = out._data
        assert isinstance(root, lazy.LazyOut), "graph severed (see grad)"
        run_root, leaves, leaf_pos, key = lazy.program_for(root)
        li = leaf_pos.get(id(a.raw))
        if li is None:
            raise RuntimeError(f"argument {i} not reachable in the graph")
        cache_key = ("hvp", key, li)
        executor = _vag_cache.get(cache_key)
        if executor is not None:
            _vag_cache.move_to_end(cache_key)
        else:
            def hvp_fn(x, tangent, others):
                def g_of_x(xx):
                    vals = list(others)
                    vals[li] = xx
                    return jax.grad(
                        lambda *ls: run_root(*ls), argnums=li
                    )(*vals)

                return jax.jvp(g_of_x, (x,), (tangent,))[1]

            executor = jax.jit(hvp_fn)
            lazy._lru_put(
                _vag_cache, cache_key, executor,
                settings.lazy_program_cache,
            )
        res = executor(leaves[li], v.raw, tuple(leaves))
        return BlockArray(res, a.grid.copy(), a.backend,
                          transposed=a.is_transposed)

    return wrapped


def check_grad(f, args, argnums=0, eps=1e-5, atol=1e-3):
    """Finite-difference check (testing utility): max abs deviation
    between autodiff and central differences on the LOGICAL entries."""
    nums, single = _normalize_argnums(argnums)
    _, grads = value_and_grad(f, argnums=argnums)(*args)
    if single:
        grads = (grads,)
    worst = 0.0
    for i, g in zip(nums, grads):
        a = args[i]
        host = np.asarray(a.get(), dtype=np.float64)
        g_host = np.asarray(g.get(), dtype=np.float64)
        it = np.nditer(host, flags=["multi_index"])
        for _ in it:
            ix = it.multi_index
            hp = host.copy()
            hp[ix] += eps
            hm = host.copy()
            hm[ix] -= eps
            app_args = list(args)
            from nums_tpu.core.application_manager import instance

            app = instance()
            app_args[i] = app.array(hp, block_shape=a.block_shape)
            fp = float(f(*app_args).get())
            app_args[i] = app.array(hm, block_shape=a.block_shape)
            fm = float(f(*app_args).get())
            fd = (fp - fm) / (2 * eps)
            worst = max(worst, abs(fd - g_host[ix]))
    assert worst <= atol, f"max grad deviation {worst} > {atol}"
    return worst
