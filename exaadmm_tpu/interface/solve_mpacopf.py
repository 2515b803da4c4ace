"""Multi-period ACOPF solve.

Reference: ``/root/reference/src/interface/solve_mpacopf.jl``. One behavioural
deviation, by design: the reference's ``warm_start=true`` pass solves each
period independently and then calls ``init_solution!`` which RESETS the
period states to a flat start (solve_mpacopf.jl:27-32 followed by
mpacopf_init_solution_cpu.jl:7 -> acopf init fill!(sol, 0)), discarding the
warm start entirely. Here ``warm_start=True`` keeps the solved period states
and derives the ramp coupling variables from them.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..algorithms.admm_two_level import (admm_two_level, admm_two_level_fused,
                                         make_fused_solver)
from ..models.acopf import model as acopf_M
from ..models.mpacopf import model as mp_M
from ..utils.environment import IterationInformation, Parameters
from ..utils.opfdata import load_time_series, opf_loaddata
from .solve_acopf import _default_dtype


@dataclasses.dataclass
class MpacopfResult:
    data: object
    model: "mp_M.ModelMpacopf"
    solution: "mp_M.SolutionMpacopf"
    info: IterationInformation
    err_ramp: float
    env: object | None = None     # AdmmEnv (load_specified, horizon_length)


def solve_mpacopf(
    case: str,
    load_prefix: str,
    *,
    case_format: str = "matpower",
    start_period: int = 1,
    end_period: int = 1,
    outer_iterlim: int = 20,
    inner_iterlim: int = 1000,
    rho_pq: float = 4e2,
    rho_va: float = 4e4,
    obj_scale: float = 1.0,
    scale: float = 1e-4,
    use_linelimit: bool = True,
    tight_factor: float = 1.0,
    outer_eps: float = 2e-4,
    verbose: int = 1,
    ramp_ratio: float = 0.02,
    warm_start: bool = True,
    load_scale: float = 1.0,
    use_projection: bool = False,
    dtype=None,
) -> MpacopfResult:
    dtype = dtype or _default_dtype()
    data = opf_loaddata(case, case_format=case_format, verbose=verbose)
    pd_mat, qd_mat = load_time_series(load_prefix, load_scale)
    assert pd_mat.shape[0] == data.nbus

    par = Parameters(
        outer_iterlim=outer_iterlim, inner_iterlim=inner_iterlim,
        obj_scale=obj_scale, scale=scale, outer_eps=outer_eps, verbose=verbose,
    )
    model = mp_M.build_model(
        data, par, pd_mat, qd_mat,
        start_period=start_period, end_period=end_period,
        use_linelimit=use_linelimit, tight_factor=tight_factor, dtype=dtype,
    )
    # ramp_rate override (build_grid_data uses the same default 0.02*pgmax)
    if ramp_ratio != 0.02:
        model.grid = dataclasses.replace(
            model.grid, ramp_rate=ramp_ratio * model.grid.pgmax)
        model.grid_T = None
        model.__post_init__()

    warm = None
    if warm_start and model.T > 1:
        single = acopf_M.ModelAcopf(grid=model.grid, par=dataclasses.replace(par),
                                    use_linelimit=use_linelimit)
        if verbose > 0:
            from ..algorithms.admm_two_level import make_inner_loop
            run_inner = make_inner_loop(single, par.inner_iterlim)
        else:
            run_fused = make_fused_solver(single)
        warm = []
        for t in range(model.T):
            s_t = acopf_M.init_solution(single, rho_pq, rho_va)
            if verbose > 0:
                s_t, info_t = admm_two_level(
                    single, s_t, IterationInformation(), run_inner=run_inner,
                    Pd=model.Pd[t], Qd=model.Qd[t],
                )
            else:
                s_t, info_t = admm_two_level_fused(
                    single, s_t, IterationInformation(), run=run_fused,
                    Pd=model.Pd[t], Qd=model.Qd[t],
                )
            if verbose > 0:
                print(f" warm start period {t+1}: {info_t.status} "
                      f"obj={info_t.objval:.6e}")
            warm.append(s_t)

    sol = mp_M.init_solution(model, rho_pq, rho_va, warm=warm)
    info = IterationInformation()
    if verbose > 0:
        sol, info = admm_two_level(model, sol, info)
    else:
        sol, info = admm_two_level_fused(model, sol, info)

    if use_projection:
        # reference: mpacopf admm_poststep delegates to each period's acopf
        # admm_poststep, which runs pf_projection on that period's state with
        # that period's loads (mpacopf_admm_prepoststep_cpu.jl:48-56 ->
        # acopf_admm_prepoststep_cpu.jl poststep)
        import jax
        import numpy as np

        from ..models.pf.projection import pf_projection
        from ..utils.environment import Blocks

        ac = sol.acopf
        v_gen, v_line = [], []
        t_total, pf_res = 0.0, 0.0
        for t in range(model.T):
            sol_t = jax.tree_util.tree_map(lambda a: a[t], ac)
            proj_t, pinfo = pf_projection(
                data, model, sol_t,
                Pd=np.asarray(model.Pd[t]), Qd=np.asarray(model.Qd[t]),
                verbose=verbose)
            v_gen.append(proj_t.v.gen)
            v_line.append(proj_t.v.line)
            t_total += pinfo.get("time", 0.0)
            pf_res = max(pf_res, pinfo.get("pf_residual") or 0.0)
        sol = sol.replace(acopf=ac.replace(
            v=Blocks(gen=jnp.stack(v_gen), line=jnp.stack(v_line))))
        info.time_projection = t_total
        info.pf_residual = pf_res

    err_ramp = mp_M.check_ramp_violations(model, sol)
    if verbose > 0:
        print(f" ** mpacopf: {info.status} obj={info.objval:.6e} "
              f"err_ramp={err_ramp:.3e}")
    from ..utils.environment import AdmmEnv
    env = AdmmEnv(case=case, data=data, initial_rho_pq=rho_pq,
                  initial_rho_va=rho_va, params=model.par,
                  tight_factor=tight_factor, use_linelimit=use_linelimit,
                  use_projection=use_projection, load_specified=True,
                  horizon_length=end_period - start_period + 1)
    return MpacopfResult(data=data, model=model, solution=sol, info=info,
                         err_ramp=err_ramp, env=env)
