"""Pallas-kernel TRON path vs the pure-JAX XLA path (fp32, any backend).

On CPU these run the Pallas interpreter lowering path only if supported;
skip when pallas compilation is unavailable on the test platform.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exaadmm_tpu.models.acopf import model as M
from exaadmm_tpu.models.acopf.branch import (
    _branch_params, _warm_start_x0, branch_cons_linelimit, branch_obj_linelimit)
from exaadmm_tpu.ops.tron import tron_alm_batched
from exaadmm_tpu.ops.tron_pallas import tron_alm_batched_pallas
from exaadmm_tpu.utils.environment import Parameters
from exaadmm_tpu.utils.opfdata import opf_loaddata


def test_pallas_matches_xla_interpret(case9_path):
    data = opf_loaddata(case9_path, verbose=0)
    par = Parameters(verbose=0)
    model = M.build_model(data, par, dtype=jnp.float32)
    sol = M.init_solution(model, 4e2, 4e4)
    params = _branch_params(sol, model.grid, par)
    x0, xl, xu = _warm_start_x0(sol.u.line, model.grid, True)
    alm = sol.branch_alm
    lam0 = jnp.stack([alm.lam1, alm.lam2])
    eps = float(jnp.finfo(jnp.float32).eps)
    kw = dict(gtol=40 * eps, frtol=10 * eps, ctol=300 * eps,
              max_minor=200, max_auglag=50)

    r1 = tron_alm_batched(branch_obj_linelimit, branch_cons_linelimit,
                          x0, xl, xu, params, lam0, alm.mu, **kw)
    r2 = tron_alm_batched_pallas(branch_obj_linelimit, branch_cons_linelimit,
                                 x0, xl, xu, params, lam0, alm.mu,
                                 tile=256, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(r1.minor_iters),
                                  np.asarray(r2.minor_iters))
