"""Multi-device partition tests on a virtual 8-device CPU mesh.

The missing layer of the reference's test suite (its MPI path is untested,
SURVEY.md §4): sharded line partition + psum-coupled bus/residual updates
must reproduce the single-device solve.
"""

import jax
import numpy as np
import pytest

from exaadmm_tpu import solve_acopf
from exaadmm_tpu.parallel.sharding import make_mesh


@pytest.fixture(scope="module")
def cpu_mesh():
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 devices")
    return make_mesh(devices=devs[:8])


def test_case9_sharded_matches_single(case9_path, cpu_mesh):
    kw = dict(rho_pq=4e2, rho_va=4e4, outer_eps=2e-5, outer_iterlim=6, verbose=0)
    res1 = solve_acopf(case9_path, **kw)
    resN = solve_acopf(case9_path, mesh=cpu_mesh, **kw)
    assert resN.info.cumul == res1.info.cumul
    assert resN.info.objval == pytest.approx(res1.info.objval, rel=1e-8)
    assert resN.info.primres == pytest.approx(res1.info.primres, rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(resN.solution.u.gen), np.asarray(res1.solution.u.gen),
        atol=1e-8,
    )
    # line block: padded lanes differ (8-dev pad vs none); compare real lines
    np.testing.assert_allclose(
        np.asarray(resN.solution.u.line)[:9], np.asarray(res1.solution.u.line),
        atol=1e-6,
    )


def test_case9_sharded_full_solve(case9_path, cpu_mesh):
    res = solve_acopf(case9_path, mesh=cpu_mesh, rho_pq=4e2, rho_va=4e4,
                      outer_eps=2e-5, outer_iterlim=25, verbose=0)
    assert res.info.status == "Solved"
    assert 5296.0 <= res.info.objval <= 5304.5
