"""Fused single-dispatch two-level driver == host-stepped driver.

Same update order and break conditions, so iterates, iteration counts and
scalars must match (fp64, CPU backend; the only differences possible are
compiler-fusion rounding, hence the tight-but-not-zero tolerances on
floats and exact equality on counts/status).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from exaadmm_tpu.algorithms.admm_two_level import (admm_two_level,
                                                   admm_two_level_fused)
from exaadmm_tpu.models.acopf import model as M
from exaadmm_tpu.utils.environment import IterationInformation, Parameters
from exaadmm_tpu.utils.opfdata import opf_loaddata


def test_fused_matches_host_driver(case9_path):
    data = opf_loaddata(case9_path, verbose=0)
    par = Parameters(verbose=0, outer_iterlim=8, outer_eps=2e-5)
    model = M.build_model(data, par, dtype=jnp.float64)

    s1, i1 = admm_two_level(model, M.init_solution(model, 4e2, 4e4),
                            IterationInformation())
    s2, i2 = admm_two_level_fused(model, M.init_solution(model, 4e2, 4e4),
                                  IterationInformation())

    assert i2.status == i1.status
    assert i2.outer == i1.outer
    assert i2.cumul == i1.cumul
    assert i2.objval == pytest.approx(i1.objval, rel=1e-10)
    assert i2.mismatch == pytest.approx(i1.mismatch, rel=1e-8)
    np.testing.assert_allclose(np.asarray(s2.u.gen), np.asarray(s1.u.gen),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(s2.u.line), np.asarray(s1.u.line),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(s2.lz.line), np.asarray(s1.lz.line),
                               atol=1e-10)


def test_beta_cap_dtype_aware():
    """fp32 beta escalation is capped at 0.1/eps (~8.4e5); fp64 keeps the
    reference constant 1e24 exactly (admm_two_level.jl:75) so pinned fp64
    trajectories cannot move."""
    import jax.numpy as jnp

    from exaadmm_tpu.algorithms.admm_two_level import _beta_cap

    assert _beta_cap(jnp.float64) == 1e24
    cap32 = _beta_cap(jnp.float32)
    assert abs(cap32 - 0.1 / float(jnp.finfo(jnp.float32).eps)) < 1.0
    assert 1e5 < cap32 < 1e6
