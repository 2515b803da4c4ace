"""On-device (TPU) tests in the production configuration: fp32, Pallas
branch backend, two-pass straggler compaction, line sorting.

These are the hardware-gated tests the reference runs when
``CUDA.functional()`` is true (/root/reference/test/runtests.jl:23). They
skip on CPU; run them with ``EXAADMM_TEST_PLATFORM=axon python -m pytest
tests/test_tpu_device.py`` (or ``python tools/run_tpu_tests.py``, which also
records TESTS_TPU.json for the round artifacts).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="device tests need real TPU hardware (EXAADMM_TEST_PLATFORM=axon)",
)


@pytest.fixture(scope="module")
def synth300():
    from exaadmm_tpu.utils.synthetic import synthetic_case
    return synthetic_case(300, seed=3)


def _branch_inputs(data, *, backend, two_pass, tile=1024):
    from exaadmm_tpu.models.acopf import model as M
    from exaadmm_tpu.utils.environment import Parameters

    par = Parameters(verbose=0, tron_step_cap=24, branch_backend=backend,
                     pallas_tile=tile, branch_two_pass=two_pass,
                     branch_pass1_cap=2, scale=1e-4)
    model = M.build_model(data, par, dtype=jnp.float32)
    sol = M.init_solution(model, 400.0, 40000.0)
    # perturb prox targets so lanes have a spread of difficulties
    rng = np.random.default_rng(0)
    v_line = sol.v.line + jnp.asarray(
        rng.normal(0, 0.05, sol.v.line.shape), jnp.float32)
    sol = sol.replace(v=sol.v.replace(line=v_line))
    return model, sol, par


def test_tron_pallas_matches_xla_on_device(synth300):
    """The compiled Mosaic kernel and the XLA while-loop path run the same
    lockstep state machine; on identical fp32 inputs their iterates must
    agree to fp32 roundoff (tests/test_tron_pallas.py proves exactness in
    interpret mode; this is the compiled-on-hardware check)."""
    from exaadmm_tpu.models.acopf.branch import branch_update

    model, sol, par = _branch_inputs(synth300, backend="pallas",
                                     two_pass=False, tile=256)
    inner = jnp.asarray(2, jnp.int32)
    u_p, alm_p, st_p = branch_update(sol, model.grid, par, inner)

    par_x = dataclasses.replace(par, branch_backend="xla")
    u_x, alm_x, st_x = branch_update(sol, model.grid, par_x, inner)

    u_p, u_x = np.asarray(u_p), np.asarray(u_x)
    # identical trip counts lane-for-lane
    np.testing.assert_array_equal(np.asarray(st_p["lane_steps"]),
                                  np.asarray(st_x["lane_steps"]))
    np.testing.assert_allclose(u_p, u_x, rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(alm_p.lam1), np.asarray(alm_x.lam1),
                               rtol=1e-4, atol=1e-3)


def test_two_pass_lane_identity_on_device(synth300):
    """Two-pass compaction is lane-exact in the production config (fp32,
    pallas) — the on-device counterpart of tests/test_branch_two_pass.py."""
    from exaadmm_tpu.models.acopf.branch import branch_update

    # Mosaic lane dim: tile must be a multiple of 128
    model, sol, par = _branch_inputs(synth300, backend="pallas",
                                     two_pass=True, tile=128)
    par = dataclasses.replace(par, branch_tail_tiles=1, branch_pass1_cap=6)
    assert model.grid.nline_padded >= 4 * par.branch_tail_tiles * par.pallas_tile
    inner = jnp.asarray(2, jnp.int32)
    u2, alm2, st2 = branch_update(sol, model.grid, par, inner)

    par1 = dataclasses.replace(par, branch_two_pass=False)
    u1, alm1, st1 = branch_update(sol, model.grid, par1, inner)

    assert int(st2["tail_overflow"]) == 0
    np.testing.assert_array_equal(np.asarray(st1["lane_steps"]),
                                  np.asarray(st2["lane_steps"]))
    # same lane, same trajectory: fp32 arithmetic is identical per lane, but
    # tile composition may flush differently through Mosaic — allow roundoff
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                               rtol=0, atol=2e-6)


def test_case9_converges_fp32_production():
    import os
    from exaadmm_tpu import solve_acopf

    case9 = os.path.join(os.path.dirname(__file__), "..", "data", "case9.m")
    # fp32 residual floor sits above the fp64 outer_eps=2e-5 band; 2e-4 is
    # the production tolerance on TPU (README quality table)
    res = solve_acopf(case9, rho_pq=4e2, rho_va=4e4, outer_eps=2e-4,
                      outer_iterlim=25, verbose=0, dtype=jnp.float32,
                      branch_backend="pallas")
    assert res.info.status == "Solved"
    # fp64 anchor 5300.596 (tests/test_solve_acopf.py PIN_OBJ); fp32 tracks it
    assert abs(res.info.objval - 5300.596) < 5.0


def test_synth300_converges_fp32_production(synth300):
    from exaadmm_tpu.interface.solve_acopf import SolveResult  # noqa: F401
    from exaadmm_tpu.algorithms.admm_two_level import admm_two_level_fused
    from exaadmm_tpu.models.acopf import model as M
    from exaadmm_tpu.utils.environment import Parameters

    par = Parameters(verbose=0, tron_step_cap=24, branch_backend="pallas",
                     pallas_tile=1024, outer_iterlim=20, outer_eps=2e-4,
                     scale=1e-4)
    model = M.build_model(synth300, par, dtype=jnp.float32)
    sol = M.init_solution(model, 400.0, 40000.0)
    sol, info = admm_two_level_fused(model, sol)
    assert info.status == "Solved"
    assert info.mismatch <= np.sqrt(2 * model.grid.ngen
                                    + 8 * model.grid.nline) * par.outer_eps
