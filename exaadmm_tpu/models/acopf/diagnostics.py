"""Solution-quality diagnostics.

Equivalent of the per-constraint error fields the reference carries in
``ComponentInformation`` (environment.jl:277-326: err_pg/err_qg/err_vm/
err_real/err_reactive/err_rateA, rateA violation count) — computed here in
one vectorised pass from the converged state.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import ops as jops

from ...utils.grid_data import GridData


def compute_violations(gd: GridData, u, v, Pd=None, Qd=None) -> dict:
    """Returns max violations of the original ACOPF constraints at u/v.

    - err_pg/err_qg: generator bound violations of u
    - err_vm: voltage-magnitude bound violation of the line-owned w copies
    - err_real/err_reactive: bus power-balance residuals using u flows and
      the consensus voltage copies
    - err_rateA: squared-flow line-limit violation (p^2+q^2 - rateA)_+
    - num_rateA_viols: number of lines violating their limit
    - err_consensus: max |u - v| mismatch
    """
    if Pd is None:
        Pd = gd.Pd
    if Qd is None:
        Qd = gd.Qd
    m = gd.line_mask
    nline = gd.nline
    uL = u.line
    nbus = gd.nbus

    err_pg = jnp.max(jnp.maximum(
        jnp.maximum(gd.pgmin - u.gen[:, 0], u.gen[:, 0] - gd.pgmax), 0.0))
    err_qg = jnp.max(jnp.maximum(
        jnp.maximum(gd.qgmin - u.gen[:, 1], u.gen[:, 1] - gd.qgmax), 0.0))

    wi, wj = uL[:, 4], uL[:, 5]
    vm_lo_i = gd.fr_vm_bound[:, 0] ** 2
    vm_hi_i = gd.fr_vm_bound[:, 1] ** 2
    vm_lo_j = gd.to_vm_bound[:, 0] ** 2
    vm_hi_j = gd.to_vm_bound[:, 1] ** 2
    err_vm = jnp.max(jnp.maximum(jnp.maximum(
        jnp.maximum(vm_lo_i - wi, wi - vm_hi_i),
        jnp.maximum(vm_lo_j - wj, wj - vm_hi_j)), 0.0) * m)

    # bus power balance from u flows + gen injections, consensus w for shunts
    def seg(vals, ids):
        return jops.segment_sum(vals * m, ids, num_segments=nbus)

    p_inj = (jops.segment_sum(u.gen[:, 0], gd.gen_bus, num_segments=nbus)
             - seg(uL[:, 0], gd.line_from) - seg(uL[:, 2], gd.line_to)
             - Pd / gd.baseMVA)
    q_inj = (jops.segment_sum(u.gen[:, 1], gd.gen_bus, num_segments=nbus)
             - seg(uL[:, 1], gd.line_from) - seg(uL[:, 3], gd.line_to)
             - Qd / gd.baseMVA)
    w_bus = jops.segment_sum(v.line[:, 4] * m, gd.line_from, num_segments=nbus)
    cnt = (jops.segment_sum(m, gd.line_from, num_segments=nbus)
           + jops.segment_sum(m, gd.line_to, num_segments=nbus))
    w_bus = (w_bus + jops.segment_sum(v.line[:, 5] * m, gd.line_to,
                                      num_segments=nbus)) / jnp.maximum(cnt, 1)
    err_real = jnp.max(jnp.abs(p_inj - gd.YshR * w_bus))
    err_reactive = jnp.max(jnp.abs(q_inj + gd.YshI * w_bus))

    sq_ij = uL[:, 0] ** 2 + uL[:, 1] ** 2
    sq_ji = uL[:, 2] ** 2 + uL[:, 3] ** 2
    rate_viol = jnp.maximum(jnp.maximum(sq_ij, sq_ji) - gd.rate_a, 0.0) * m
    err_rateA = jnp.max(rate_viol)
    num_rateA = jnp.sum((rate_viol > 1e-8).astype(jnp.int32))

    err_consensus = jnp.maximum(
        jnp.max(jnp.abs(u.gen - v.gen)),
        jnp.max(jnp.abs(uL - v.line) * m[:, None]))

    del nline
    return {
        "err_pg": float(err_pg),
        "err_qg": float(err_qg),
        "err_vm": float(err_vm),
        "err_real": float(err_real),
        "err_reactive": float(err_reactive),
        "err_rateA": float(err_rateA),
        "num_rateA_viols": int(num_rateA),
        "err_consensus": float(err_consensus),
    }
