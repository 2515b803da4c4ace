"""Power flow + projection tests."""

import numpy as np
import pytest

from exaadmm_tpu.models.pf.newton import solve_pf, build_ybus
from exaadmm_tpu.utils.opfdata import opf_loaddata


def test_case9_power_flow(case9_path):
    data = opf_loaddata(case9_path, verbose=0)
    res = solve_pf(data, start_method="warm", verbose=0)
    assert res.converged
    assert res.residual <= 1e-6
    # known case9 base-case power-flow solution voltages (MATPOWER runpf):
    # Vm ~ [1.0, 1.0, 1.0, 0.987, 0.975, 1.003, 0.986, 0.996, 0.958]
    np.testing.assert_allclose(
        res.vm[:4], [1.0, 1.0, 1.0, 0.987], atol=5e-3)
    assert res.vm.min() > 0.95


def test_ybus_symmetric_structure(case9_path):
    data = opf_loaddata(case9_path, verbose=0)
    Y = build_ybus(data).toarray()
    # no phase shifters in case9 -> Ybus symmetric
    np.testing.assert_allclose(Y, Y.T, atol=1e-12)


def test_projection_after_admm(case9_path):
    from exaadmm_tpu import solve_acopf

    res = solve_acopf(case9_path, rho_pq=4e2, rho_va=4e4, outer_eps=2e-5,
                      outer_iterlim=25, verbose=0, use_projection=True)
    assert res.info.status == "Solved"
    # projected v satisfies power flow: consistent per-bus voltages on lines
    v = np.asarray(res.solution.v.line)
    data = res.data
    wi_from = v[:, 4]
    wi_to = v[:, 5]
    # every line pair sharing a bus agrees exactly after projection
    for b in range(data.nbus):
        ws = np.concatenate([wi_from[data.line_from == b], wi_to[data.line_to == b]])
        assert np.ptp(ws) < 1e-12
    assert res.info.time_projection > 0
