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


def test_closed_form_fgh_matches_autodiff():
    """branch_fgh_linelimit (hand-derived f/grad/Hessian) vs autodiff on
    random data, fp64."""
    import numpy as np
    from exaadmm_tpu.models.acopf.branch import (
        branch_fgh_linelimit, branch_obj_linelimit)

    rng = np.random.default_rng(7)
    B = 64
    p = {k: jnp.asarray(rng.normal(0, 2, B)) for k in
         ("YffR", "YffI", "YftR", "YftI", "YttR", "YttI", "YtfR", "YtfI")}
    p["l"] = jnp.asarray(rng.normal(0, 50, (8, B)))
    p["rho"] = jnp.asarray(rng.uniform(1, 4e4, (8, B)))
    p["t"] = jnp.asarray(rng.normal(0, 1, (8, B)))
    p["scale"] = jnp.asarray(rng.uniform(1e-5, 1e-3, B))
    x = jnp.asarray(np.concatenate([rng.uniform(0.9, 1.1, (2, B)),
                                    rng.uniform(-0.5, 0.5, (2, B)),
                                    rng.uniform(-5, 0, (2, B))]))
    lam = jnp.asarray(rng.normal(0, 10, (2, B)))
    mu = jnp.asarray(rng.uniform(1, 1e6, B))

    f, g, H = branch_fgh_linelimit(x, p, lam, mu)
    f_ad = branch_obj_linelimit(x, p, lam, mu)
    grad_fn = jax.grad(lambda X: jnp.sum(branch_obj_linelimit(X, p, lam, mu)))
    g_ad = grad_fn(x)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ad), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad),
                               rtol=1e-8, atol=1e-8)
    for j in range(6):
        tang = jnp.zeros_like(x).at[j].set(1.0)
        _, hj = jax.jvp(grad_fn, (x,), (tang,))
        for i in range(6):
            np.testing.assert_allclose(
                np.asarray(H[i][j]), np.asarray(hj[i]),
                rtol=1e-7, atol=1e-7 * float(jnp.max(jnp.abs(hj[i])) + 1))
