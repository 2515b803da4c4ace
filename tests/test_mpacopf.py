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


def test_case9_mpacopf_no_warmstart(case9_path):
    prefix = os.path.join(os.path.dirname(case9_path), "case9_demand")
    res = solve_mpacopf(
        case9_path, prefix,
        start_period=1, end_period=2,
        rho_pq=4e2, rho_va=4e4, outer_iterlim=30, outer_eps=2e-4,
        verbose=0, warm_start=False,
    )
    assert res.info.status == "Solved"
    assert res.err_ramp <= 1e-3
