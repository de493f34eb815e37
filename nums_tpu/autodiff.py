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


def _normalize_argnums(argnums):
    if isinstance(argnums, int):
        return (argnums,), True
    return tuple(argnums), False


def _rebuild(raw, template: BlockArray) -> BlockArray:
    """New BlockArray with ``template``'s grid/backend/transpose over a
    same-layout raw buffer (gradient/update results)."""
    return BlockArray(raw, template.grid.copy(), template.backend,
                      transposed=template.is_transposed)


def _trace_pure(f, args, kwargs):
    """Run ``f`` verifying NO materialization fired inside it: a host
    sync between dependent ops would rebind intermediates to concrete
    buffers, and a gradient through the remaining graph would silently
    treat them as constants."""
    before = lazy.materialize_count()
    out = f(*args, **kwargs)
    if lazy.materialize_count() != before:
        raise RuntimeError(
            "a host sync (get/float/bool/print/...) fired INSIDE the "
            "traced function: the synced subexpressions were materialized "
            "and a gradient would silently treat them as constants. "
            "Remove syncs from the traced function (or raise "
            "NUMS_TPU_LAZY_MAX_DEPTH if a deep chain forced one)."
        )
    return out


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
        out = _trace_pure(f, args, kwargs)
        assert isinstance(out, BlockArray) and out.shape == (), (
            "f must return a SCALAR BlockArray (shape ()); got "
            f"{getattr(out, 'shape', type(out))}"
        )
        root = out._data
        if not isinstance(root, lazy.LazyOut) or root.call.results is not None:
            raise RuntimeError(
                "f's output is already materialized — a host sync inside "
                "f (get/float/bool/...) severed the recorded graph before "
                "the gradient could be taken."
            )
        run_root, leaves, leaf_pos, key = lazy.program_for(
            root, forbid_interior_constants=True
        )
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
        if len(set(idxs)) != len(idxs):
            raise ValueError(
                "two differentiated arguments share the same underlying "
                "buffer (the same array, or views like x and x.T); pass "
                "distinct arrays or differentiate one argument."
            )
        executor = lazy.cached_executor(
            ("vag", key, tuple(idxs)),
            lambda: jax.jit(
                jax.value_and_grad(run_root, argnums=tuple(idxs))
            ),
        )
        val, grads = executor(*leaves)
        backend = wrt[0].backend
        val_ba = BlockArray.from_jax(val, backend=backend)
        grad_bas = tuple(
            _rebuild(g, a) for g, a in zip(grads, wrt)
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
        if tuple(v.raw.shape) != tuple(a.raw.shape):
            # Same logical shape but different physical padding/blocking
            # would fail deep inside jax.jvp; reblock the tangent to the
            # primal's layout up front.
            v = v.reshape(a.shape, block_shape=a.block_shape)
            v.touch()
        out = _trace_pure(f, args, kwargs)
        assert isinstance(out, BlockArray) and out.shape == ()
        root = out._data
        if not isinstance(root, lazy.LazyOut) or root.call.results is not None:
            raise RuntimeError("graph severed inside f (see grad)")
        run_root, leaves, leaf_pos, key = lazy.program_for(
            root, forbid_interior_constants=True
        )
        li = leaf_pos.get(id(a.raw))
        if li is None:
            raise RuntimeError(f"argument {i} not reachable in the graph")

        def build():
            def hvp_fn(x, tangent, others):
                def g_of_x(xx):
                    vals = list(others)
                    vals[li] = xx
                    return jax.grad(
                        lambda *ls: run_root(*ls), argnums=li
                    )(*vals)

                return jax.jvp(g_of_x, (x,), (tangent,))[1]

            return jax.jit(hvp_fn)

        executor = lazy.cached_executor(("hvp", key, li), build)
        res = executor(leaves[li], v.raw, tuple(leaves))
        return _rebuild(res, a)

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
