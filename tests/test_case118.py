"""case118 end-to-end regression — the above-toy-scale correctness anchor.

The reference pins, for case118 at rho_pq=4e2 / rho_va=4e4 / outer_eps=2e-5:
status Solved, outer=20, cumul=1232, objective 129645.676 rtol 1e-6
(/root/reference/test/algorithms/acopf_update_cpu.jl:174-179).

Iterate-exact parity across solver implementations is out of reach (fp
association and TRON termination points differ), so this test asserts:
  * the reference's objective within 1e-4 relative — both solvers stop at a
    loose consensus tolerance, so their objectives differ at the ~5e-5 level
    by trajectory, not by data (a tighter solve here reaches 129655.4 at
    mismatch 2.7e-4, marching to MATPOWER's documented optimum ~129660.7);
  * this repo's OWN trajectory pinned exactly (outer / cumul integers and
    the objective to 1e-10 relative) so silent drift is caught.

Pinned values measured on CPU fp64 (the test platform of conftest.py); the
fused one-dispatch driver and the host-stepped driver produce bit-identical
trajectories (tests/test_fused_driver.py), so the pins hold for both.
"""

import os

import pytest

from exaadmm_tpu import solve_acopf

CASE118 = os.path.join(os.path.dirname(__file__), "..", "data", "case118.m")

# this repo's own pinned trajectory (fp64, XLA CPU)
PIN_OUTER = 20
PIN_CUMUL = 1281
# measured under the test env (conftest: 8 virtual CPU devices — reduction
# layouts differ from the 1-device run at the ~1e-8 relative level)
# re-pinned after sort_lines default flipped to False in round 4 (counts
# unchanged; objective shifted 5e-9 rel from reduction-order rounding)
PIN_OBJ = 129638.35360544993


@pytest.mark.slow
def test_case118_two_level_pinned():
    res = solve_acopf(
        CASE118,
        outer_iterlim=25,
        rho_pq=4e2,
        rho_va=4e4,
        outer_eps=2e-5,
        verbose=0,
    )
    assert res.info.status == "Solved"
    # reference anchor (acopf_update_cpu.jl:178): same outer count, objective
    # within cross-implementation slack
    assert res.info.outer == 20
    assert abs(res.info.objval - 129645.676) / 129645.676 < 1e-4
    # own-trajectory pins: exact integers + tight objective
    assert res.info.outer == PIN_OUTER
    assert res.info.cumul == PIN_CUMUL
    assert abs(res.info.objval - PIN_OBJ) / PIN_OBJ < 1e-10
