"""Generic two-level ADMM driver.

Reference: ``/root/reference/src/algorithms/admm_two_level.jl``. The outer
augmented-Lagrangian loop stays on the host (<= ``outer_iterlim`` trips, a few
scalars read back per trip); the entire inner ADMM loop runs on-device as one
jitted ``lax.while_loop`` — the TPU-native replacement for the reference's
per-iteration kernel launches with device->host norm readbacks.

Inner iteration order (admm_two_level.jl:34-63):
    z_prev <- z;  x;  xbar;  z;  l;  residual
with the adaptive inner tolerance eps_pri = sqrt(nvar)/(2500*outer) and break
when primres <= eps_pri. Outer: converged when ||u - v|| <= sqrt(nvar)*
outer_eps; otherwise lz <- clamp(lz + beta z) and beta <- min(inc_c*beta,
1e24) when ||z|| > theta*||z_prev||.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

from ..utils.environment import IterationInformation, Solution
from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class InnerCarry:
    sol: Solution
    inner: jnp.ndarray     # i32
    primres: jnp.ndarray
    dualres: jnp.ndarray
    norm_z: jnp.ndarray
    mismatch: jnp.ndarray
    objval: jnp.ndarray
    auglag: jnp.ndarray
    avg_auglag_it: jnp.ndarray
    avg_minor_it: jnp.ndarray


def _one_inner_iteration(model, carry: InnerCarry, beta, axis_name=None,
                         Pd=None, Qd=None, pg_bounds=None) -> InnerCarry:
    # models implement the hook protocol (the TPU analogue of the reference's
    # 11-hook multiple-dispatch protocol, docs/src/dev.md)
    sol = carry.sol
    sol = model.inner_prestep(sol)                      # z_prev <- z
    inner = carry.inner + 1
    sol, stats = model.update_x(sol, inner, axis_name=axis_name,
                                pg_bounds=pg_bounds)
    sol = model.update_xbar(sol, Pd=Pd, Qd=Qd, axis_name=axis_name)
    sol = model.update_z(sol, beta)
    sol = model.update_l(sol, beta)
    sol, scalars = model.update_residual(sol, beta, axis_name=axis_name)
    return InnerCarry(
        sol=sol,
        inner=inner,
        primres=scalars["primres"],
        dualres=scalars["dualres"],
        norm_z=scalars["norm_z_curr"],
        mismatch=scalars["mismatch"],
        objval=scalars["objval"],
        auglag=scalars["auglag"],
        avg_auglag_it=stats["avg_auglag_it"],
        avg_minor_it=stats["avg_minor_it"],
    )


def make_inner_loop(model, inner_iterlim: int):
    """Build the jitted on-device inner loop for a model instance."""
    sqrt_d = float(model.nvar) ** 0.5

    @jax.jit
    def run_inner(sol: Solution, beta, outer, Pd, Qd, pgmin_curr, pgmax_curr):
        eps_pri = sqrt_d / (2500.0 * outer)

        def cond(c: InnerCarry):
            return (c.inner < inner_iterlim) & (c.primres > eps_pri)

        def body(c: InnerCarry):
            return _one_inner_iteration(model, c, beta, Pd=Pd, Qd=Qd,
                                        pg_bounds=(pgmin_curr, pgmax_curr))

        dt = sol.u.gen.dtype
        c0 = InnerCarry(
            sol=sol,
            inner=jnp.zeros((), jnp.int32),
            primres=jnp.asarray(jnp.inf, dt),
            dualres=jnp.asarray(jnp.inf, dt),
            norm_z=jnp.asarray(jnp.inf, dt),
            mismatch=jnp.asarray(jnp.inf, dt),
            objval=jnp.asarray(0.0, dt),
            auglag=jnp.asarray(0.0, dt),
            avg_auglag_it=jnp.asarray(0.0, dt),
            avg_minor_it=jnp.asarray(0.0, dt),
        )
        return lax.while_loop(cond, body, c0)

    return run_inner


def admm_two_level(model, sol: Solution, info: IterationInformation | None = None,
                   run_inner=None, Pd=None, Qd=None,
                   pgmin_curr=None, pgmax_curr=None):
    """Run the two-level ADMM; returns (sol, info).

    ``run_inner`` may be a pre-built (possibly sharded) inner-loop callable
    (see parallel.sharding.make_sharded_inner_loop); defaults to the
    single-device jitted loop. Pd/Qd and the (possibly ramp-tightened) pg
    bounds are runtime arguments so rolling-horizon re-solves reuse one
    compiled loop (reference re-solves mutate grid_data in place,
    acopf_admm_rolling_cpu.jl:33-47).
    """
    par = model.par
    info = info or IterationInformation()
    sqrt_d = float(model.nvar) ** 0.5
    outer_tol = sqrt_d * par.outer_eps

    if run_inner is None:
        run_inner = make_inner_loop(model, par.inner_iterlim)
    if Pd is None:
        Pd = model.default_Pd()
    if Qd is None:
        Qd = model.default_Qd()
    if pgmin_curr is None:
        pgmin_curr = model.pgmin_curr
    if pgmax_curr is None:
        pgmax_curr = model.pgmax_curr
    lz_step = jax.jit(lambda s, b: model.update_lz(s, b))

    beta = par.initial_beta
    info.status = "IterationLimit"
    info.norm_z_curr = info.norm_z_prev = float("inf")

    if par.verbose > 0:
        print(f"{'Outer':>6} {'Inner':>6} {'Objval':>12} {'AugLag':>12} "
              f"{'PrimRes':>10} {'EpsPrim':>10} {'DualRes':>10} {'||z||':>10} "
              f"{'Mismatch':>10} {'OuterTol':>10} {'Beta':>10}")

    t0 = time.perf_counter()
    while info.outer < par.outer_iterlim:
        info.outer += 1
        info.norm_z_prev = info.norm_z_curr  # outer prestep: save ||z||

        carry = run_inner(sol, jnp.asarray(beta, sol.u.gen.dtype),
                          jnp.asarray(float(info.outer), sol.u.gen.dtype),
                          Pd, Qd, pgmin_curr, pgmax_curr)
        sol = carry.sol
        info.inner = int(carry.inner)
        info.cumul += info.inner
        info.primres = float(carry.primres)
        info.dualres = float(carry.dualres)
        info.norm_z_curr = float(carry.norm_z)
        info.mismatch = float(carry.mismatch)
        info.objval = float(carry.objval)
        info.auglag = float(carry.auglag)
        info.eps_pri = sqrt_d / (2500.0 * info.outer)

        if par.verbose > 0:
            print(f"{info.outer:>6d} {info.inner:>6d} {info.objval:>12.5e} "
                  f"{info.auglag:>12.5e} {info.primres:>10.3e} "
                  f"{info.eps_pri:>10.3e} {info.dualres:>10.3e} "
                  f"{info.norm_z_curr:>10.3e} {info.mismatch:>10.3e} "
                  f"{outer_tol:>10.3e} {beta:>10.3e}")

        if info.mismatch <= outer_tol:
            info.status = "Solved"
            break

        sol = lz_step(sol, jnp.asarray(beta, sol.u.gen.dtype))

        if info.norm_z_curr > par.theta * info.norm_z_prev:
            beta = min(par.inc_c * beta, 1e24)

    info.time_overall = time.perf_counter() - t0
    par.beta = beta
    return sol, info
