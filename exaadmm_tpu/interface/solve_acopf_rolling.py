"""Rolling-horizon ACOPF: re-solve per period, warm-started, ramp-tightened.

Reference: ``solve_acopf_rolling`` + ``admm_restart_rolling``
(``/root/reference/src/interface/solve_acopf_rolling.jl``,
``src/models/acopf/acopf_admm_rolling_cpu.jl``): for each period t the loads
are swapped to column t, ``admm_two_level`` re-enters with the previous
period's full solution state, and afterwards the real-power bounds are
tightened to ``u +- ramp_rate``. Here the per-period Pd/Qd and bounds are
runtime arguments of one compiled inner loop — no recompilation between
periods.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..algorithms.admm_two_level import (admm_two_level, admm_two_level_fused,
                                         make_fused_solver, make_inner_loop)
from ..models.acopf import model as M
from ..utils.environment import IterationInformation, Parameters
from ..utils.opfdata import load_time_series, opf_loaddata
from .solve_acopf import SolveResult, _default_dtype


def update_real_power_current_bounds(pgmin, pgmax, ramp_rate, pg_curr):
    """pgmin_curr = max(pgmin, pg - r); pgmax_curr = min(pgmax, pg + r)
    (acopf_admm_rolling_cpu.jl:1-13)."""
    return (
        jnp.maximum(pgmin, pg_curr - ramp_rate),
        jnp.minimum(pgmax, pg_curr + ramp_rate),
    )


def solve_acopf_rolling(
    case: str,
    load_prefix: str,
    *,
    case_format: str = "matpower",
    outer_iterlim: int = 20,
    inner_iterlim: int = 1000,
    rho_pq: float = 400.0,
    rho_va: float = 40000.0,
    obj_scale: float = 1.0,
    scale: float = 1e-4,
    use_linelimit: bool = True,
    tight_factor: float = 0.99,
    outer_eps: float = 2e-4,
    verbose: int = 1,
    ramp_ratio: float = 0.02,
    start_period: int = 1,
    end_period: int = 6,
    load_scale: float = 1.0,
    dtype=None,
):
    """Returns (SolveResult for the last period, list of per-period infos)."""
    dtype = dtype or _default_dtype()
    data = opf_loaddata(case, case_format=case_format, verbose=verbose)
    pd_mat, qd_mat = load_time_series(load_prefix, load_scale)
    assert pd_mat.shape[0] == data.nbus, (
        f"load file has {pd_mat.shape[0]} rows for {data.nbus} buses")
    nperiods = pd_mat.shape[1]
    assert 1 <= start_period <= end_period <= nperiods

    par = Parameters(
        outer_iterlim=outer_iterlim, inner_iterlim=inner_iterlim,
        obj_scale=obj_scale, scale=scale, outer_eps=outer_eps, verbose=verbose,
    )
    model = M.build_model(
        data, par, use_linelimit=use_linelimit, tight_factor=tight_factor,
        dtype=dtype,
    )
    model = dataclasses.replace(model)  # own copy for mutable bound fields
    ramp_rate = ramp_ratio * model.grid.pgmax

    sol = M.init_solution(model, rho_pq, rho_va)
    if verbose > 0:
        run_inner = make_inner_loop(model, par.inner_iterlim)
    else:
        run_fused = make_fused_solver(model)

    pgmin_curr, pgmax_curr = model.grid.pgmin, model.grid.pgmax
    infos = []
    for t in range(start_period - 1, end_period):
        Pd = jnp.asarray(pd_mat[:, t], dtype)
        Qd = jnp.asarray(qd_mat[:, t], dtype)
        info = IterationInformation()
        if verbose > 0:
            sol, info = admm_two_level(
                model, sol, info, run_inner=run_inner, Pd=Pd, Qd=Qd,
                pgmin_curr=pgmin_curr, pgmax_curr=pgmax_curr,
            )
        else:
            sol, info = admm_two_level_fused(
                model, sol, info, run=run_fused, Pd=Pd, Qd=Qd,
                pgmin_curr=pgmin_curr, pgmax_curr=pgmax_curr,
            )
        infos.append(info)
        if verbose > 0:
            print(f" ** Period {t + 1}: status={info.status} "
                  f"obj={info.objval:.6e} mismatch={info.mismatch:.3e} "
                  f"time={info.time_overall:.3f}s")
        pgmin_curr, pgmax_curr = update_real_power_current_bounds(
            model.grid.pgmin, model.grid.pgmax, ramp_rate, sol.u.gen[:, 0]
        )

    model.pgmin_curr, model.pgmax_curr = pgmin_curr, pgmax_curr
    return SolveResult(data=data, model=model, solution=sol, info=infos[-1]), infos
