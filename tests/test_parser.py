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
