"""Checkpoint round-trip + resume test."""

import numpy as np

from exaadmm_tpu.models.acopf import model as M
from exaadmm_tpu.utils.checkpoint import load_solution, save_solution
from exaadmm_tpu.utils.environment import Parameters
from exaadmm_tpu.utils.opfdata import opf_loaddata
from exaadmm_tpu.algorithms.admm_two_level import admm_two_level


def test_checkpoint_roundtrip_and_resume(case9_path, tmp_path):
    data = opf_loaddata(case9_path, verbose=0)
    par = Parameters(verbose=0, outer_iterlim=5, outer_eps=2e-5)
    model = M.build_model(data, par)
    sol0 = M.init_solution(model, 4e2, 4e4)
    sol5, info5 = admm_two_level(model, sol0)

    p = str(tmp_path / "ckpt.npz")
    save_solution(p, sol5, meta={"outer": info5.outer, "beta": par.beta})
    restored, meta = load_solution(p, M.init_solution(model, 4e2, 4e4))
    assert meta["outer"] == 5
    np.testing.assert_array_equal(np.asarray(restored.u.line),
                                  np.asarray(sol5.u.line))

    # resume from checkpoint: 5 + 20 more outers reaches the solution
    par2 = Parameters(verbose=0, outer_iterlim=20, outer_eps=2e-5,
                      initial_beta=meta["beta"])
    model2 = M.build_model(data, par2)
    solF, infoF = admm_two_level(model2, restored)
    assert infoF.status == "Solved"
    assert 5296.0 <= infoF.objval <= 5304.5


def test_checkpoint_orbax_roundtrip(case9_path, tmp_path):
    from exaadmm_tpu.utils.checkpoint import (load_solution_orbax,
                                              save_solution_orbax)

    data = opf_loaddata(case9_path, verbose=0)
    par = Parameters(verbose=0, outer_iterlim=2)
    model = M.build_model(data, par)
    sol0 = M.init_solution(model, 4e2, 4e4)
    sol2, info2 = admm_two_level(model, sol0)

    p = str(tmp_path / "ckpt_orbax")
    save_solution_orbax(p, sol2, meta={"outer": info2.outer})
    restored, meta = load_solution_orbax(p, M.init_solution(model, 4e2, 4e4))
    assert meta["outer"] == 2
    np.testing.assert_array_equal(np.asarray(restored.u.line),
                                  np.asarray(sol2.u.line))
    np.testing.assert_array_equal(np.asarray(restored.branch_alm.mu),
                                  np.asarray(sol2.branch_alm.mu))
