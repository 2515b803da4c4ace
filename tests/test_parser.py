import numpy as np
import pytest

from exaadmm_tpu.utils.opfdata import opf_loaddata
from exaadmm_tpu.utils.grid_data import build_grid_data


def test_case9_sizes(case9_path):
    d = opf_loaddata(case9_path, verbose=0)
    assert d.nbus == 9
    assert d.ngen == 3
    assert d.nline == 9
    assert d.bus_ref == 0
    assert d.baseMVA == 100.0


def test_case9_per_unit_gen(case9_path):
    d = opf_loaddata(case9_path, verbose=0)
    np.testing.assert_allclose(d.pgmax, [2.5, 3.0, 2.7])
    np.testing.assert_allclose(d.pgmin, [0.1, 0.1, 0.1])
    np.testing.assert_allclose(d.qgmax, [3.0, 3.0, 3.0])
    np.testing.assert_allclose(d.c2, [0.11, 0.085, 0.1225])
    np.testing.assert_allclose(d.c1, [5.0, 1.2, 1.0])
    np.testing.assert_allclose(d.c0, [150.0, 600.0, 335.0])


def test_case9_admittances(case9_path):
    d = opf_loaddata(case9_path, verbose=0)
    # line 0: 1-4, r=0, x=0.0576, b=0 -> Ys = -j/0.0576
    ys = 1.0 / 0.0576
    np.testing.assert_allclose(d.YffR[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(d.YffI[0], -ys, rtol=1e-12)
    np.testing.assert_allclose(d.YftI[0], ys, rtol=1e-12)
    np.testing.assert_allclose(d.YttI[0], -ys, rtol=1e-12)
    # line 1: 4-5, r=.017 x=.092 b=.158
    Ys = 1.0 / complex(0.017, 0.092)
    Ytt = Ys + 0.5j * 0.158
    np.testing.assert_allclose(d.YttR[1], Ytt.real, rtol=1e-12)
    np.testing.assert_allclose(d.YttI[1], Ytt.imag, rtol=1e-12)
    np.testing.assert_allclose(d.YftR[1], -Ys.real, rtol=1e-12)
    np.testing.assert_allclose(d.YftI[1], -Ys.imag, rtol=1e-12)
    # Yff == Ytt when tap == 0
    np.testing.assert_allclose(d.YffR[1], Ytt.real, rtol=1e-12)
    # loads
    np.testing.assert_allclose(d.Pd, [0, 0, 0, 0, 90, 0, 100, 0, 125])
    np.testing.assert_allclose(d.Qd, [0, 0, 0, 0, 30, 0, 35, 0, 50])


def test_grid_data_bounds_and_rate(case9_path):
    d = opf_loaddata(case9_path, verbose=0)
    gd = build_grid_data(d, tight_factor=0.99)
    # line 0 from bus 1 (ref): Va bounds pinned to 0
    assert float(gd.fr_va_bound[0, 0]) == 0.0
    assert float(gd.fr_va_bound[0, 1]) == 0.0
    # non-ref ends keep [-2pi, 2pi]
    assert float(gd.to_va_bound[0, 0]) == pytest.approx(-2 * np.pi)
    # rateA: 0.99 * (250/100)^2
    np.testing.assert_allclose(float(gd.rate_a[0]), 0.99 * 2.5**2, rtol=1e-12)
    # Vm bounds from bus table
    np.testing.assert_allclose(np.asarray(gd.fr_vm_bound[:, 1]), 1.1)


def test_line_padding(case9_path):
    d = opf_loaddata(case9_path, verbose=0)
    gd = build_grid_data(d, pad_lines_to=4)
    assert gd.nline_padded == 12
    assert gd.nline == 9
    np.testing.assert_allclose(np.asarray(gd.line_mask), [1] * 9 + [0] * 3)


def test_synthetic_case_has_feasible_point():
    """The synthetic generator must produce cases with a known AC-feasible
    operating point (loads derived from a drawn voltage profile)."""
    from exaadmm_tpu.models.pf.newton import solve_pf_core
    from exaadmm_tpu.utils.synthetic import synthetic_case

    data = synthetic_case(300, seed=3)
    res = solve_pf_core(data, data.Vm.copy(), data.Va.copy(),
                        data.Pg0.copy(), data.Qg0.copy(), tol=1e-9)
    # already at the solution: zero NR iterations needed
    assert res.iterations == 0
    assert res.residual <= 1e-9
    # the point respects the generated bounds
    assert np.all(data.Pg0 <= data.pgmax + 1e-12)
    assert np.all(data.Pg0 >= data.pgmin - 1e-12)
    assert np.all(np.abs(data.Qg0) <= data.qgmax + 1e-12)


def test_pglib_layout(case9_path):
    """The pglib gen-table layout (10-column mpc.gen) parses to the same
    OPFData as the 21-column matpower layout (reference get_field_names,
    parse_matpower.jl:18-44), and solves identically."""
    import os
    from exaadmm_tpu import solve_acopf

    pglib_path = os.path.join(os.path.dirname(case9_path), "case9_pglib.m")
    d_mp = opf_loaddata(case9_path, verbose=0)
    d_pg = opf_loaddata(pglib_path, case_format="pglib", verbose=0)
    for f in ("Pd", "Qd", "pgmin", "pgmax", "qgmin", "qgmax", "c2", "c1",
              "c0", "YffR", "YftI", "rateA"):
        np.testing.assert_allclose(np.asarray(getattr(d_pg, f)),
                                   np.asarray(getattr(d_mp, f)), err_msg=f)
    res = solve_acopf(pglib_path, case_format="pglib", rho_pq=4e2,
                      rho_va=4e4, outer_eps=2e-5, outer_iterlim=25, verbose=0)
    assert res.info.status == "Solved"
    assert 5296.0 <= res.info.objval <= 5304.5


def test_case118_parses_and_balances():
    """case118 transcription sanity: documented totals and a power flow that
    reproduces the stored solved state (data/case118.m provenance check)."""
    import os
    from exaadmm_tpu.models.pf.newton import solve_pf_core

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "case118.m")
    d = opf_loaddata(path, verbose=0)
    assert (d.nbus, d.ngen, d.nline) == (118, 54, 186)
    assert d.Pd.sum() == 4242.0          # documented case118 total load (MW)
    assert d.Qd.sum() == 1438.0
    res = solve_pf_core(d, d.Vm.copy(), d.Va.copy(), d.Pg0.copy(),
                        d.Qg0.copy(), tol=1e-10)
    assert res.converged and res.iterations <= 4
    # stored Vm reproduced within its 3-decimal rounding everywhere; stored
    # Va within the Q-limit-enforcement difference (<= 0.32 deg)
    assert np.max(np.abs(res.vm - d.Vm)) < 1.5e-3
    assert np.max(np.abs(res.va - d.Va)) < np.deg2rad(0.35)
