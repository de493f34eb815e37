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
        "momentum": lambda: optax.sgd(learning_rate, momentum=0.9, **kw),
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
             tol: float = 1e-6, callback=None, **optimizer_kwargs):
    """Minimize scalar ``f(x)`` starting from BlockArray ``x0``.

    Each step runs ONE cached value-and-grad program (the whole
    objective expression fused) plus one optax update on the raw
    buffer; the convergence test max|g| <= tol costs one scalar sync
    per step — the same cadence as the reference's solver loops.
    ``callback(step, value, grad_max)`` observes progress.
    """
    import jax.numpy as jnp

    vag = autodiff.value_and_grad(f)
    opt = _optimizer(method, learning_rate, **optimizer_kwargs)
    x = x0
    opt_state = opt.init(x0.raw)
    val = np.inf
    gmax = np.inf
    it = 0
    for it in range(1, int(steps) + 1):
        val_ba, g = vag(x)
        updates, opt_state = opt.update(g.raw, opt_state, x.raw)
        import optax

        new_raw = optax.apply_updates(x.raw, updates)
        x = BlockArray(new_raw, x.grid.copy(), x.backend,
                       transposed=x.is_transposed)
        gmax = float(jnp.max(jnp.abs(g.raw)))  # one scalar sync
        if callback is not None:
            val = float(val_ba.get())
            callback(it, val, gmax)
        if gmax <= tol:
            val = float(val_ba.get())
            break
    else:
        val = float(vag(x)[0].get())
    return OptimizeResult(
        x=x, fun=val, grad_max=gmax, n_iter=it, converged=gmax <= tol
    )
