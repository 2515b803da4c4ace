"""Feasibility restoration after ADMM: power-flow projection.

Reference: ``/root/reference/src/models/pf/pf_projection.jl``. Steps:
1. average per-bus Vm / Va over all incident-line copies in ``u``,
2. run Newton-Raphson from that point (Vm fixed at PV/slack buses, generator
   P/Q fixed at the ADMM values),
3. write the solved bus voltages back into every incident line's ``v`` rows,
4. recompute slack-bus P/Q and PV-bus Q from the solved flows and split
   across the colocated generators.

Host-side numpy (the reference copies to host too).
"""

from __future__ import annotations

import time

import numpy as np
import jax.numpy as jnp

from ...utils.environment import Blocks
from ...utils.opfdata import OPFData
from .newton import build_ybus, solve_pf_core


def pf_projection(data: OPFData, model, sol, Pd=None, Qd=None,
                  tol: float = 1e-6, max_iter: int = 50, verbose: int = 0):
    """Returns (sol with projected v, info dict)."""
    t0 = time.perf_counter()
    nb, ng = data.nbus, data.ngen
    nline = data.nline
    u_line = np.asarray(sol.u.line)[:nline]
    u_gen = np.asarray(sol.u.gen)
    v_line = np.asarray(sol.v.line).copy()
    f, t = data.line_from, data.line_to

    if Pd is None:
        Pd = data.Pd
    if Qd is None:
        Qd = data.Qd

    # 1. per-bus averages of the duplicated (w, theta) line copies
    cnt = np.bincount(f, minlength=nb) + np.bincount(t, minlength=nb)
    vm_sum = (np.bincount(f, weights=np.sqrt(np.maximum(u_line[:, 4], 0.0)),
                          minlength=nb)
              + np.bincount(t, weights=np.sqrt(np.maximum(u_line[:, 5], 0.0)),
                            minlength=nb))
    va_sum = (np.bincount(f, weights=u_line[:, 6], minlength=nb)
              + np.bincount(t, weights=u_line[:, 7], minlength=nb))
    cnt_safe = np.maximum(cnt, 1)
    vm = np.clip(vm_sum / cnt_safe, data.Vmin, data.Vmax)
    va = va_sum / cnt_safe

    # 2. NR with gen setpoints from the ADMM u (v gens <- u gens first,
    #    pf_projection.jl:33)
    pg0 = u_gen[:, 0].copy()
    qg0 = u_gen[:, 1].copy()
    res = solve_pf_core(data, vm, va, pg0, qg0, Pd=Pd, Qd=Qd, tol=tol,
                        max_iter=max_iter, verbose=verbose)
    vm, va = res.vm, res.va

    # 3. write voltages back into the line consensus copies
    v_line[:nline, 4] = vm[f] ** 2
    v_line[:nline, 6] = va[f]
    v_line[:nline, 5] = vm[t] ** 2
    v_line[:nline, 7] = va[t]

    # 4. recompute slack P/Q and PV-bus Q from solved flows
    V = vm * np.exp(1j * va)
    Ybus = build_ybus(data)
    S = V * np.conj(Ybus @ V)  # net injection
    v_gen = u_gen.copy()

    gen_cnt = np.bincount(data.gen_bus, minlength=nb)
    sbus = data.bus_ref
    pg_s = S.real[sbus] + Pd[sbus] / data.baseMVA
    qg_s = S.imag[sbus] + Qd[sbus] / data.baseMVA
    for g in np.nonzero(data.gen_bus == sbus)[0]:
        v_gen[g, 0] = pg_s / gen_cnt[sbus]
        v_gen[g, 1] = qg_s / gen_cnt[sbus]

    pv = np.nonzero(data.bus_type == 2)[0]
    for b in pv:
        qg_b = S.imag[b] + Qd[b] / data.baseMVA
        for g in np.nonzero(data.gen_bus == b)[0]:
            v_gen[g, 1] = qg_b / gen_cnt[b]

    dtype = sol.v.gen.dtype
    new_v = Blocks(gen=jnp.asarray(v_gen, dtype), line=jnp.asarray(v_line, dtype))
    info = {
        "time": time.perf_counter() - t0,
        "pf_residual": res.residual,
        "pf_iterations": res.iterations,
        "pf_converged": res.converged,
    }
    return sol.replace(v=new_v), info
