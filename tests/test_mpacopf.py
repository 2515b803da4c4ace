"""Multi-period ACOPF tests (reference: mpacopf case9 x 3 periods regression,
test/algorithms/mpacopf_update_cpu.jl:431-434 asserts Solved with objective
~= 3x the single-period value)."""

import os

import numpy as np
import pytest

from exaadmm_tpu.interface.solve_mpacopf import solve_mpacopf


def test_case9_mpacopf_3periods(case9_path):
    prefix = os.path.join(os.path.dirname(case9_path), "case9_demand")
    res = solve_mpacopf(
        case9_path, prefix,
        start_period=1, end_period=3,
        rho_pq=4e2, rho_va=4e4, outer_iterlim=25, outer_eps=2e-4,
        verbose=0,
    )
    assert res.info.status == "Solved"
    # three periods of roughly the case9 objective (loads 1.0/1.015/1.005)
    assert 3 * 5200.0 <= res.info.objval <= 3 * 5450.0
    # own-trajectory pins (fp64 XLA CPU; reference pins its own cumul=729 /
    # obj 15901.48, mpacopf_update_cpu.jl:431-434 — the warm start here keeps
    # the joint solve at 4 outer / 12 cumul, see solve_mpacopf docstring)
    assert res.info.outer == 4
    assert res.info.cumul == 12
    assert abs(res.info.objval - 16019.152412382537) / 16019.152412382537 < 1e-8
    # ramp feasibility at the reported tolerance
    assert res.err_ramp <= 1e-3
    # per-period generation tracks the per-period load ordering
    pg = np.asarray(res.solution.acopf.u.gen[:, :, 0]).sum(axis=1)
    assert pg[1] > pg[0] > 0


def test_case9_mpacopf_no_warmstart_pinned(case9_path):
    """Reference-faithful joint-solve shape: flat start, all periods coupled.

    The reference's mpacopf regression runs the joint solve to 20 outer /
    729 cumul, obj 15901.48 (mpacopf_update_cpu.jl:431-434, ExaData demand
    artifact). That demand series isn't redistributable, so exact objective
    parity is impossible; this pins OUR trajectory on the in-repo demand
    series with the same shape — 20 outer rounds from a flat start — as an
    iterate-exact regression (fp64 XLA CPU)."""
    prefix = os.path.join(os.path.dirname(case9_path), "case9_demand")
    res = solve_mpacopf(
        case9_path, prefix,
        start_period=1, end_period=3,
        rho_pq=4e2, rho_va=4e4, outer_iterlim=30, outer_eps=2e-4,
        verbose=0, warm_start=False,
    )
    assert res.info.status == "Solved"
    assert res.info.outer == 20
    assert res.info.cumul == 1007
    assert res.info.objval == pytest.approx(16015.6958770167, rel=1e-10)
    assert res.err_ramp <= 1e-3


def test_case9_mpacopf_projection(case9_path):
    """use_projection threads through solve_mpacopf: every period's final
    consensus state is replaced by an NR-projected power-flow solution
    (reference admm_poststep hook, mpacopf_admm_prepoststep_cpu.jl:48-56)."""
    import jax.numpy as jnp

    prefix = os.path.join(os.path.dirname(case9_path), "case9_demand")
    res = solve_mpacopf(
        case9_path, prefix,
        start_period=1, end_period=2,
        rho_pq=4e2, rho_va=4e4, outer_iterlim=25, outer_eps=2e-4,
        verbose=0, use_projection=True,
    )
    assert res.info.status == "Solved"
    assert res.info.time_projection > 0.0
    assert res.info.pf_residual < 1e-6  # NR converged for every period
    # projected voltage copies are consistent per bus: the fr copy of w_i on
    # every line equals vm^2 at that bus (exact after projection)
    for t in range(2):
        v_line = np.asarray(res.solution.acopf.v.line[t])
        fr = np.asarray(res.model.grid.line_from)
        w_by_bus = {}
        for i, b in enumerate(fr):
            w_by_bus.setdefault(int(b), []).append(v_line[i, 4])
        for b, ws in w_by_bus.items():
            assert np.ptp(ws) < 1e-12


def test_mpacopf_projection_uses_period_loads(case9_path):
    """Projection must solve each period's power flow with THAT period's
    loads (advisor r4 high: solve_pf_core read base-case data.Pd/Qd and
    silently projected onto the wrong power flow). load_scale=1.3 makes
    every period's demand differ materially from the base case; the
    projected state must balance against the scaled loads."""
    from exaadmm_tpu.models.pf.newton import build_ybus
    import scipy.sparse as sp

    prefix = os.path.join(os.path.dirname(case9_path), "case9_demand")
    res = solve_mpacopf(
        case9_path, prefix,
        start_period=1, end_period=2,
        rho_pq=4e2, rho_va=4e4, outer_iterlim=25, outer_eps=2e-4,
        verbose=0, use_projection=True, load_scale=1.3,
    )
    assert res.info.pf_residual < 1e-6
    data = res.data
    Ybus = build_ybus(data)
    Cg = sp.coo_matrix(
        (np.ones(data.ngen), (data.gen_bus, np.arange(data.ngen))),
        shape=(data.nbus, data.ngen)).tocsr()
    fr = np.asarray(res.model.grid.line_from)
    to = np.asarray(res.model.grid.line_to)
    for t in range(2):
        v_line = np.asarray(res.solution.acopf.v.line[t])
        v_gen = np.asarray(res.solution.acopf.v.gen[t])
        vm2 = np.zeros(data.nbus)
        va = np.zeros(data.nbus)
        vm2[fr], vm2[to] = v_line[:, 4], v_line[:, 5]
        va[fr], va[to] = v_line[:, 6], v_line[:, 7]
        V = np.sqrt(vm2) * np.exp(1j * va)
        S = V * np.conj(Ybus @ V)
        Sgen = Cg @ (v_gen[:, 0] + 1j * v_gen[:, 1])
        Sload_t = (np.asarray(res.model.Pd[t])
                   + 1j * np.asarray(res.model.Qd[t])) / data.baseMVA
        mis = S - Sgen + Sload_t
        # balanced against the period-t (scaled) loads at every bus
        assert np.abs(mis).max() < 1e-5, f"period {t}: {np.abs(mis).max()}"
        # and demonstrably NOT balanced against the base-case loads
        mis_base = S - Sgen + (data.Pd + 1j * data.Qd) / data.baseMVA
        assert np.abs(mis_base).max() > 1e-2
