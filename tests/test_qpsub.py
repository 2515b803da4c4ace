"""QP-subproblem (qpsub) tests.

The SQP base point and golden one-iteration vectors are numeric fixtures from
the reference test (tests/qpsub_fixture.py); the QP-input derivation below
follows the documented construction (linearized 1h/1i/1j/1k rows, delta
bounds, shifted costs — qpsub_update_cpu.jl:33-140) re-written in numpy.

Reference end-to-end regression: one-level ADMM, 5107 iterations,
objective -21.92744641968529 (qpsub_update_cpu.jl:235-238).
"""

import numpy as np
import pytest

from exaadmm_tpu.utils.opfdata import opf_loaddata
from exaadmm_tpu.utils.grid_data import build_grid_data

from . import qpsub_fixture as fx


@pytest.fixture(scope="module")
def qp_inputs(case9_path):
    data = opf_loaddata(case9_path, verbose=0)
    gd = build_grid_data(data)
    nline, ngen, nbus = data.nline, data.ngen, data.nbus
    g = lambda a: np.asarray(a, float)  # noqa: E731

    lv, lf = fx.line_var, fx.line_fl
    fr_vm_hi = g(gd.fr_vm_bound[:, 1]); fr_vm_lo = g(gd.fr_vm_bound[:, 0])
    to_vm_hi = g(gd.to_vm_bound[:, 1]); to_vm_lo = g(gd.to_vm_bound[:, 0])
    fr_va_lo = g(gd.fr_va_bound[:, 0]); fr_va_hi = g(gd.fr_va_bound[:, 1])
    to_va_lo = g(gd.to_va_bound[:, 0]); to_va_hi = g(gd.to_va_bound[:, 1])

    ls = np.zeros((nline, 6)); us = np.zeros((nline, 6))
    ls[:, 0] = ls[:, 1] = -2 * fr_vm_hi * to_vm_hi
    us[:, 0] = us[:, 1] = 2 * fr_vm_hi * to_vm_hi
    ls[:, 2] = fr_vm_lo**2 - lv[2]; us[:, 2] = fr_vm_hi**2 - lv[2]
    ls[:, 3] = to_vm_lo**2 - lv[3]; us[:, 3] = to_vm_hi**2 - lv[3]
    ls[:, 4] = fr_va_lo - lv[4]; us[:, 4] = fr_va_hi - lv[4]
    ls[:, 5] = to_va_lo - lv[5]; us[:, 5] = to_va_hi - lv[5]

    Pd = data.baseMVA * (data.Pd / data.baseMVA
                         - (fx.pgb - fx.pft - fx.ptf - data.YshR * fx.bus_w))
    Qd = data.baseMVA * (data.Qd / data.baseMVA
                         - (fx.qgb - fx.qft - fx.qtf + data.YshI * fx.bus_w))

    pi_14 = -np.ones((4, nline))
    Hs = np.zeros((nline, 6, 6))
    YftR, YftI = data.YftR, data.YftI
    YffR, YffI = data.YffR, data.YffI
    YtfR, YtfI = data.YtfR, data.YtfI
    YttR, YttI = data.YttR, data.YttI
    LH_1h = np.zeros((nline, 4)); RH_1h = np.zeros(nline)
    LH_1i = np.zeros((nline, 4)); RH_1i = np.zeros(nline)
    LH_1j = np.zeros((nline, 2)); RH_1j = np.zeros(nline)
    LH_1k = np.zeros((nline, 2)); RH_1k = np.zeros(nline)
    rateA = g(gd.rate_a)

    for l in range(nline):
        H14h = np.zeros((6, 6))
        H14h[0, 0] = H14h[1, 1] = 2 * pi_14[0, l]
        H14h[2, 3] = H14h[3, 2] = -pi_14[0, l]

        dth = lv[4, l] - lv[5, l]
        c1_ = pi_14[1, l] * np.cos(dth)
        c2_ = pi_14[1, l] * np.sin(dth)
        # the reference computes cons_3 with a (likely accidental) fixed index
        # line_var[1,2] (1-based) == lv[0,1] here; keep it for parity
        c3_ = pi_14[1, l] * (-lv[0, l] * np.sin(dth) + lv[0, 1] * np.cos(dth))
        H14i = np.zeros((6, 6))
        H14i[0, 4] = H14i[4, 0] = c1_
        H14i[0, 5] = H14i[5, 0] = -c1_
        H14i[1, 4] = H14i[4, 1] = c2_
        H14i[1, 5] = H14i[5, 1] = -c2_
        H14i[4, 4] = H14i[5, 5] = c3_
        H14i[4, 5] = H14i[5, 4] = -c3_

        supY = np.array([
            [YftR[l], YftI[l], YffR[l], 0, 0, 0],
            [-YftI[l], YftR[l], -YffI[l], 0, 0, 0],
            [YtfR[l], -YtfI[l], 0, YttR[l], 0, 0],
            [-YtfI[l], -YtfR[l], 0, -YttI[l], 0, 0],
        ])
        H14j = -2 * pi_14[2, l] * (np.outer(supY[0], supY[0])
                                   + np.outer(supY[1], supY[1]))
        H14k = -2 * pi_14[3, l] * (np.outer(supY[2], supY[2])
                                   + np.outer(supY[3], supY[3]))
        Hs[l] = H14h + H14i + H14j + H14k + 4.0 * np.eye(6)

        LH_1h[l] = [2 * lv[0, l], 2 * lv[1, l], -lv[3, l], -lv[2, l]]
        RH_1h[l] = -lv[0, l]**2 - lv[1, l]**2 + lv[2, l] * lv[3, l]
        LH_1i[l] = [np.sin(dth), -np.cos(dth),
                    lv[0, l] * np.cos(dth) + lv[1, l] * np.sin(dth),
                    -lv[0, l] * np.cos(dth) - lv[1, l] * np.sin(dth)]
        RH_1i[l] = -lv[0, l] * np.sin(dth) + lv[1, l] * np.cos(dth)
        LH_1j[l] = [2 * lf[0, l], 2 * lf[1, l]]
        RH_1j[l] = -(lf[0, l]**2 + lf[1, l]**2 - rateA[l])
        LH_1k[l] = [2 * lf[2, l], 2 * lf[3, l]]
        RH_1k[l] = -(lf[2, l]**2 + lf[3, l]**2 - rateA[l])

    return dict(
        Hs=Hs, LH_1h=LH_1h, RH_1h=RH_1h, LH_1i=LH_1i, RH_1i=RH_1i,
        LH_1j=LH_1j, RH_1j=RH_1j, LH_1k=LH_1k, RH_1k=RH_1k, ls=ls, us=us,
        pgmax=data.pgmax - fx.pg, pgmin=data.pgmin - fx.pg,
        qgmax=data.qgmax - fx.qg, qgmin=data.qgmin - fx.qg,
        c1=data.c1 + 2 * data.c2 * fx.pg, c2=data.c2.copy(),
        Pd=Pd, Qd=Qd,
    )


def test_qpsub_one_iteration_golden(case9_path, qp_inputs):
    """One x/xbar/l/residual sweep matches the reference golden vectors."""
    from exaadmm_tpu.models.qpsub import model as Q
    from exaadmm_tpu.utils.environment import Parameters
    import jax.numpy as jnp

    data = opf_loaddata(case9_path, verbose=0)
    par = Parameters(verbose=0, scale=1e-4)
    model = Q.build_model(data, par, qp_inputs)
    sol = Q.init_solution(model, 20.0, 20.0)
    sol = model.one_level_reset(sol)

    sol, _ = model.update_x(sol, 1)
    u = np.concatenate([np.asarray(sol.base.u.gen).ravel(),
                        np.asarray(sol.base.u.line).ravel()])
    np.testing.assert_allclose(u, fx.U_SOL, atol=1e-4)

    sol = model.update_xbar(sol)
    v = np.concatenate([np.asarray(sol.base.v.gen).ravel(),
                        np.asarray(sol.base.v.line).ravel()])
    np.testing.assert_allclose(v, fx.V_SOL, atol=1e-4)

    sol = model.update_l_single(sol)
    l = np.concatenate([np.asarray(sol.base.l.gen).ravel(),
                        np.asarray(sol.base.l.line).ravel()])
    np.testing.assert_allclose(l, fx.L_SOL, atol=2e-3)

    sol, scalars = model.update_residual(sol, 0.0)
    rp = np.concatenate([np.asarray(sol.base.rp.gen).ravel(),
                         np.asarray(sol.base.rp.line).ravel()])
    np.testing.assert_allclose(rp, fx.RP_SOL, atol=1e-4)


def test_qpsub_solve(case9_path, qp_inputs):
    from exaadmm_tpu.interface.solve_qpsub import solve_qpsub

    res = solve_qpsub(
        case9_path,
        qp_inputs["Hs"], qp_inputs["LH_1h"], qp_inputs["RH_1h"],
        qp_inputs["LH_1i"], qp_inputs["RH_1i"],
        qp_inputs["LH_1j"], qp_inputs["RH_1j"],
        qp_inputs["LH_1k"], qp_inputs["RH_1k"],
        qp_inputs["ls"], qp_inputs["us"],
        qp_inputs["pgmax"], qp_inputs["pgmin"],
        qp_inputs["qgmax"], qp_inputs["qgmin"],
        qp_inputs["c1"], qp_inputs["c2"], qp_inputs["Pd"], qp_inputs["Qd"],
        1e5,
        outer_iterlim=10000, inner_iterlim=1, scale=1e-4, obj_scale=1.0,
        rho_pq=4000.0, rho_va=4000.0, verbose=0, outer_eps=2e-6,
        onelevel=True,
    )
    assert res.info.status == "Solved"
    # Full parity with the reference regression (qpsub_update_cpu.jl:235-238):
    # one-level ADMM lands on the SAME iteration count and objective.
    assert res.info.outer == 5107
    assert res.info.cumul == 5107
    assert res.info.objval == pytest.approx(-21.92744641968529, abs=1e-8)
    # SQP outputs populated
    assert res.sqp_out["dual_infeas"].shape == (3 + 6 * 9,)
    assert res.sqp_out["lambda"].shape == (4, 9)
    assert np.all(res.sqp_out["lambda"][2:] <= 1e-12)


def test_qpsub_sharded_solve(case9_path, qp_inputs):
    """Sharded one-level solve (lines + per-line SQP data partitioned over an
    8-device mesh) converges to the reference objective. The psum'd residual
    reductions reassociate, so iteration counts may drift slightly from the
    single-device solve; the converged objective must match."""
    from exaadmm_tpu.interface.solve_qpsub import solve_qpsub
    from exaadmm_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(8)
    res = solve_qpsub(
        case9_path,
        qp_inputs["Hs"], qp_inputs["LH_1h"], qp_inputs["RH_1h"],
        qp_inputs["LH_1i"], qp_inputs["RH_1i"],
        qp_inputs["LH_1j"], qp_inputs["RH_1j"],
        qp_inputs["LH_1k"], qp_inputs["RH_1k"],
        qp_inputs["ls"], qp_inputs["us"],
        qp_inputs["pgmax"], qp_inputs["pgmin"],
        qp_inputs["qgmax"], qp_inputs["qgmin"],
        qp_inputs["c1"], qp_inputs["c2"], qp_inputs["Pd"], qp_inputs["Qd"],
        1e5,
        outer_iterlim=10000, inner_iterlim=1, scale=1e-4, obj_scale=1.0,
        rho_pq=4000.0, rho_va=4000.0, verbose=0, outer_eps=2e-6,
        onelevel=True, mesh=mesh,
    )
    assert res.info.status == "Solved"
    assert res.info.objval == pytest.approx(-21.92744641968529, abs=1e-3)
    assert res.model.grid.nline_padded % 8 == 0


def test_qpsub_reduced_fgh_matches_autodiff(case9_path, qp_inputs):
    """Closed-form f/grad/Hessian of the reduced QP (model._reduced_qp_fns)
    vs autodiff of the same objective — the qpsub analogue of the branch
    fgh check (tests/test_tron_pallas.py)."""
    import jax
    import jax.numpy as jnp
    from exaadmm_tpu.models.qpsub import model as Q
    from exaadmm_tpu.utils.environment import Parameters

    data = opf_loaddata(case9_path, verbose=0)
    par = Parameters(verbose=0, scale=1e-4)
    m = Q.build_model(data, par, qp_inputs)
    nl = m.grid.nline_padded
    dt = m.Hs.dtype
    rng = np.random.default_rng(7)

    lL = jnp.asarray(rng.standard_normal((nl, 8)))
    rL = jnp.asarray(rng.uniform(1.0, 5.0, (nl, 8)))
    vz = jnp.asarray(rng.standard_normal((nl, 8)))
    supY6 = m.supY8[:, :, 2:]
    coef = lL[:, :4] - rL[:, :4] * (vz[:, :4] - m.line_res)
    b_br = jnp.einsum("lk,lki->li", coef, supY6)
    b_br = b_br + jnp.concatenate(
        [jnp.zeros((nl, 2), dt), lL[:, 4:] - rL[:, 4:] * vz[:, 4:]], axis=1)

    cache = Q._qp_solve_constants(m, rL)
    params = Q._reduced_qp_params(m, cache, b_br, nl, dt)
    obj, cons, fgh = Q._reduced_qp_fns()

    x = jnp.asarray(rng.standard_normal((6, nl)))
    lam = jnp.asarray(rng.standard_normal((2, nl)))
    mu = jnp.asarray(rng.uniform(1.0, 20.0, nl))

    f, g, H = fgh(x, params, lam, mu)
    np.testing.assert_allclose(f, obj(x, params, lam, mu), rtol=1e-12)

    g_ad = jax.grad(lambda X: jnp.sum(obj(X, params, lam, mu)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad),
                               rtol=1e-9, atol=1e-10)
    for j in range(6):
        e = jnp.zeros((6, nl)).at[j].set(1.0)
        _, hj = jax.jvp(
            lambda X: jax.grad(lambda Y: jnp.sum(obj(Y, params, lam, mu)))(X),
            (x,), (e,))
        for i in range(6):
            np.testing.assert_allclose(np.asarray(H[i][j]), np.asarray(hj[i]),
                                       rtol=1e-9, atol=1e-10)


def test_qpsub_projection_hook(case9_path, qp_inputs):
    """use_projection reaches qpsub's poststep like the reference's generic
    pf_projection hook (qpsub_admm_prepoststep_cpu.jl:16-19). The qpsub u
    vector holds deltas, so the projection is the same mechanical operation
    the reference performs; the hook must run NR and record its stats."""
    from exaadmm_tpu.interface.solve_qpsub import solve_qpsub

    res = solve_qpsub(
        case9_path,
        qp_inputs["Hs"], qp_inputs["LH_1h"], qp_inputs["RH_1h"],
        qp_inputs["LH_1i"], qp_inputs["RH_1i"],
        qp_inputs["LH_1j"], qp_inputs["RH_1j"],
        qp_inputs["LH_1k"], qp_inputs["RH_1k"],
        qp_inputs["ls"], qp_inputs["us"],
        qp_inputs["pgmax"], qp_inputs["pgmin"],
        qp_inputs["qgmax"], qp_inputs["qgmin"],
        qp_inputs["c1"], qp_inputs["c2"], qp_inputs["Pd"], qp_inputs["Qd"],
        1e5,
        outer_iterlim=200, inner_iterlim=1, scale=1e-4, obj_scale=1.0,
        rho_pq=4000.0, rho_va=4000.0, verbose=0, outer_eps=2e-6,
        onelevel=True, use_projection=True,
    )
    assert res.info.time_projection > 0.0
    assert res.info.pf_residual is not None
    # per-bus consistency of the projected voltage copies
    v_line = np.asarray(res.solution.base.v.line)
    fr = np.asarray(res.model.grid.line_from)[: res.data.nline]
    w_by_bus = {}
    for i, b in enumerate(fr):
        w_by_bus.setdefault(int(b), []).append(v_line[i, 4])
    for b, ws in w_by_bus.items():
        assert np.ptp(ws) < 1e-12
