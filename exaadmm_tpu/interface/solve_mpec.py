"""ACOPF with complementarity constraints (MPEC): voltage/frequency primary
control + storage. Reference: solve_acopf_mpec (src/interface/solve_mpec.jl,
disabled upstream)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..algorithms.admm_two_level import admm_two_level, admm_two_level_fused
from ..models.mpec import model as MM
from ..utils.environment import IterationInformation, Parameters
from ..utils.grid_data import build_grid_data
from ..utils.opfdata import OPFData, opf_loaddata
from .solve_acopf import _default_dtype


@dataclasses.dataclass
class MpecResult:
    data: OPFData
    model: "MM.ModelMpec"
    solution: "MM.SolutionMpec"
    info: IterationInformation
    freq_change: float
    vm_dev: float
    env: object | None = None     # AdmmEnv (storage_ratio, droop)


def make_storage(data: OPFData, storage_ratio: float, storage_charge_max: float,
                 dtype, seed: int = 0) -> MM.StorageData:
    """Random storage placement (reference opf_loaddata_matpower:224-241;
    Random.randperm there — seeded here for reproducibility)."""
    nsto = int(np.ceil(data.nbus * storage_ratio)) if storage_ratio > 0 else 0
    rng = np.random.default_rng(seed)
    buses = rng.permutation(data.nbus)[:nsto].astype(np.int32)
    f = lambda x: jnp.asarray(np.full(nsto, x), dtype)  # noqa: E731
    return MM.StorageData(
        bus=jnp.asarray(buses),
        chg_min=f(0.0),
        chg_max=f(storage_charge_max),
        energy_min=f(0.0),
        energy_max=f(1.2 * storage_charge_max),
        energy_setpoint=f(0.5 * 1.2 * storage_charge_max),
        eta_chg=f(0.9),
        eta_dis=f(1.1),
    )


def solve_acopf_mpec(
    case: str,
    *,
    case_format: str = "matpower",
    outer_iterlim: int = 20,
    inner_iterlim: int = 1000,
    rho_pq: float = 400.0,
    rho_va: float = 40000.0,
    obj_scale: float = 1.0,
    scale: float = 1e-4,
    storage_ratio: float = 0.0,
    storage_charge_max: float = 1.0,
    use_linelimit: bool = True,
    tight_factor: float = 0.99,
    outer_eps: float = 2e-5,
    droop: float = 0.04,
    verbose: int = 1,
    dtype=None,
    mesh=None,
    pad_lines_to: int = 1,
) -> MpecResult:
    """Pass ``mesh`` (a 1-D jax.sharding.Mesh) to shard the line batch over
    devices (whole solve in one shard_map dispatch)."""
    dtype = dtype or _default_dtype()
    data = opf_loaddata(case, case_format=case_format, verbose=verbose)
    if mesh is not None and pad_lines_to == 1:
        pad_lines_to = int(mesh.devices.size)
    gd = build_grid_data(data, tight_factor=tight_factor, dtype=dtype,
                         pad_lines_to=pad_lines_to)

    par = Parameters(
        outer_iterlim=outer_iterlim, inner_iterlim=inner_iterlim,
        obj_scale=obj_scale, scale=scale, outer_eps=outer_eps, verbose=verbose,
    )
    vgmin = jnp.asarray(data.Vmin[data.gen_bus], dtype)
    vgmax = jnp.asarray(data.Vmax[data.gen_bus], dtype)
    model = MM.ModelMpec(
        grid=gd, par=par,
        storage=make_storage(data, storage_ratio, storage_charge_max, dtype),
        alpha=jnp.asarray(-(1.0 / droop) * data.pgmax, dtype),
        pg_setpoint=jnp.asarray(0.5 * (data.pgmin + data.pgmax), dtype),
        vgmin=vgmin, vgmax=vgmax,
        vm_setpoint=0.5 * (vgmin + vgmax),
        use_linelimit=use_linelimit,
    )
    sol = MM.init_solution(model, rho_pq, rho_va)
    if mesh is not None:
        from ..parallel.sharding import make_sharded_fused_solver
        run = make_sharded_fused_solver(model, mesh)
        sol, info = admm_two_level_fused(model, sol, run=run)
    elif verbose > 0:
        sol, info = admm_two_level(model, sol)
    else:
        sol, info = admm_two_level_fused(model, sol)

    freq_change = float(sol.v.fg[0]) if gd.ngen > 0 else 0.0
    vm_dev = float(jnp.max(jnp.abs(jnp.sqrt(jnp.maximum(sol.u.vg, 0.0))
                                   - model.vm_setpoint)))
    if verbose > 0:
        print(f"Frequency change = {freq_change: 12.6e}")
        print(f"|VM-VM^sp|_infty = {vm_dev: 12.6e}")
    from ..utils.environment import AdmmEnv
    env = AdmmEnv(case=case, data=data, initial_rho_pq=rho_pq,
                  initial_rho_va=rho_va, params=par,
                  tight_factor=tight_factor, use_linelimit=use_linelimit,
                  storage_ratio=storage_ratio, droop=droop)
    return MpecResult(data=data, model=model, solution=sol, info=info,
                      freq_change=freq_change, vm_dev=vm_dev, env=env)
