"""Generic first-order optimization over BlockArray objectives.

``minimize`` drives any scalar function written against the public
array API: gradients come from :mod:`nums_tpu.autodiff` (the recorded
op DAG transposed into one cached XLA program), parameter updates from
optax (adam/sgd/momentum/…) applied on the raw device buffers. This
generalizes the hand-fused GLM solvers (``models/fast_glm``) to
arbitrary user objectives — something the reference cannot express at
all (its per-block tasks are not differentiable).

    from nums_tpu import optimize

    def loss(beta):
        r = X @ beta - y
        return (r * r).sum() / len(y_np)

    result = optimize.minimize(loss, beta0, method="adam",
                               learning_rate=0.1, steps=200)
    result.x, result.fun, result.n_iter
"""

import dataclasses

import numpy as np

from nums_tpu import autodiff
from nums_tpu.core.array.blockarray import BlockArray

__all__ = ["minimize", "OptimizeResult"]


@dataclasses.dataclass
class OptimizeResult:
    x: BlockArray          # final parameters
    fun: float             # final objective value
    grad_max: float        # max|g| at the final iterate
    n_iter: int
    converged: bool


def _optimizer(method, learning_rate, **kw):
    import optax

    table = {
        "sgd": lambda: optax.sgd(learning_rate, **kw),
        "momentum": lambda: optax.sgd(
            learning_rate, **{"momentum": 0.9, **kw}
        ),
        "adam": lambda: optax.adam(learning_rate, **kw),
        "adamw": lambda: optax.adamw(learning_rate, **kw),
        "rmsprop": lambda: optax.rmsprop(learning_rate, **kw),
        "adagrad": lambda: optax.adagrad(learning_rate, **kw),
    }
    if method not in table:
        raise ValueError(f"unknown method {method!r}; one of {list(table)}")
    return table[method]()


def minimize(f, x0: BlockArray, method: str = "adam",
             learning_rate: float = 0.1, steps: int = 200,
             tol: float = 1e-6, callback=None, fused: bool = False,
             **optimizer_kwargs):
    """Minimize scalar ``f(x)`` starting from BlockArray ``x0``.

    Each step runs ONE cached value-and-grad program (the whole
    objective expression fused) plus one optax update on the raw
    buffer; the convergence test max|g| <= tol costs one scalar sync
    per step — the same cadence as the reference's solver loops.
    ``callback(step, value, grad_max)`` observes progress.

    ``fused=True`` compiles the ENTIRE loop — objective, gradient,
    optax update, convergence test — into ONE on-device
    ``lax.while_loop`` program with ZERO per-step host syncs (the
    ``fast_glm`` treatment, for arbitrary objectives; no callback).
    """
    import jax.numpy as jnp

    if fused:
        assert callback is None, "fused=True runs on-device (no callback)"
        return _minimize_fused(
            f, x0, method, learning_rate, int(steps), float(tol),
            optimizer_kwargs,
        )
    vag = autodiff.value_and_grad(f)
    opt = _optimizer(method, learning_rate, **optimizer_kwargs)
    x = x0
    opt_state = opt.init(x0.raw)
    # Invariant: fun and grad_max in the result are evaluated AT the
    # returned x (both exit paths), so res.fun == f(res.x).
    it = 0
    for it in range(1, int(steps) + 1):
        val_ba, g = vag(x)
        gmax = float(jnp.max(jnp.abs(g.raw)))  # one scalar sync
        if callback is not None:
            callback(it, float(val_ba.get()), gmax)
        if gmax <= tol:
            return OptimizeResult(
                x=x, fun=float(val_ba.get()), grad_max=gmax,
                n_iter=it, converged=True,
            )
        updates, opt_state = opt.update(g.raw, opt_state, x.raw)
        import optax

        new_raw = optax.apply_updates(x.raw, updates)
        x = BlockArray(new_raw, x.grid.copy(), x.backend,
                       transposed=x.is_transposed)
    val_ba, g = vag(x)  # evaluate at the final (returned) iterate
    gmax = float(jnp.max(jnp.abs(g.raw)))
    return OptimizeResult(
        x=x, fun=float(val_ba.get()), grad_max=gmax, n_iter=it,
        converged=gmax <= tol,
    )


def _minimize_fused(f, x0, method, learning_rate, steps, tol, opt_kwargs):
    """The whole optimization as ONE XLA program: a lax.while_loop over
    (value_and_grad → optax update), cached by graph structure +
    optimizer config. Zero host syncs until the final fetch."""
    import jax
    import jax.numpy as jnp

    from nums_tpu.core import lazy, settings

    if not settings.lazy_batch:
        raise RuntimeError("fused minimize requires NUMS_TPU_LAZY=1")
    x0.touch()
    out = autodiff._trace_pure(f, (x0,), {})
    assert isinstance(out, BlockArray) and out.shape == (), (
        "f must return a scalar BlockArray"
    )
    root = out._data
    assert isinstance(root, lazy.LazyOut), "graph severed inside f"
    run_root, leaves, leaf_pos, key = lazy.program_for(
        root, forbid_interior_constants=True
    )
    li = leaf_pos.get(id(x0.raw))
    if li is None:
        raise RuntimeError("x0 is not reachable in f's recorded graph")
    opt_items = tuple(sorted(opt_kwargs.items()))

    def build():
        opt = _optimizer(method, learning_rate, **dict(opt_items))

        def fused(tol_v, *leaf_vals):
            import optax

            def f_of_x(x):
                vals = list(leaf_vals)
                vals[li] = x
                return run_root(*vals)

            def cond(c):
                it, _, _, gmax = c
                return jnp.logical_and(it < steps, gmax > tol_v)

            def body(c):
                it, x, st, _ = c
                g = jax.grad(f_of_x)(x)
                upd, st = opt.update(g, st, x)
                x = optax.apply_updates(x, upd)
                return it + 1, x, st, jnp.max(jnp.abs(g))

            x0_v = leaf_vals[li]
            init = (jnp.int32(0), x0_v, opt.init(x0_v),
                    jnp.asarray(jnp.inf, x0_v.dtype))
            it, x, _, _ = jax.lax.while_loop(cond, body, init)
            # Value AND gradient at the RETURNED x (result invariant).
            val, g_final = jax.value_and_grad(f_of_x)(x)
            return x, val, jnp.max(jnp.abs(g_final)), it

        return jax.jit(fused)

    executor = lazy.cached_executor(
        ("fmin", key, li, method, learning_rate, steps, opt_items), build
    )
    x_raw, val, gmax, it = executor(tol, *leaves)
    x = BlockArray(x_raw, x0.grid.copy(), x0.backend,
                   transposed=x0.is_transposed)
    gmax_f = float(gmax)
    return OptimizeResult(
        x=x, fun=float(val), grad_max=gmax_f, n_iter=int(it),
        converged=gmax_f <= tol,
    )
