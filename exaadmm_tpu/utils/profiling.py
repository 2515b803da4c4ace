"""Per-hook timing (reference IterationInformation time_* fields).

The production inner loop is one fused ``lax.while_loop``, so per-hook wall
times don't exist there; this utility jits each hook separately and times it
— the analogue of the reference's ``@timed`` per-kernel accounting
(environment.jl:341-347), intended for tuning, not the hot path.

Also exposes ``trace(path)``: a thin wrapper over ``jax.profiler`` for full
XLA traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def profile_iteration(model, sol, beta, iters: int = 5) -> dict:
    """Time each ADMM hook separately (warm-compiled, `iters` repetitions).

    Returns {hook: seconds_per_call}. Note: separately-dispatched hooks carry
    per-dispatch overhead the fused loop doesn't; treat ratios, not sums, as
    meaningful.
    """
    dtype = jax.tree_util.tree_leaves(sol)[0].dtype
    beta = jnp.asarray(beta, dtype)
    one = jnp.asarray(1, jnp.int32)

    hooks = {
        "x_update": jax.jit(lambda s: model.update_x(s, one)[0]),
        "xbar_update": jax.jit(lambda s: model.update_xbar(s)),
        "z_update": jax.jit(lambda s: model.update_z(s, beta)),
        "l_update": jax.jit(lambda s: model.update_l(s, beta)),
        "residual": jax.jit(lambda s: model.update_residual(s, beta)[0]),
    }
    out = {}
    for name, fn in hooks.items():
        try:
            r = fn(sol)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(iters):
                r = fn(sol)
            jax.block_until_ready(r)
            out[name] = (time.perf_counter() - t0) / iters
        except TypeError:
            continue  # model without this hook (e.g. one-level)
    return out


@contextlib.contextmanager
def trace(path: str):
    """XLA profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
