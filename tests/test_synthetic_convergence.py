"""The benchmark workload must be a *converging* ADMM instance: solve a
smaller instance of the same synthetic family to the reference tolerance."""

from exaadmm_tpu.algorithms.admm_two_level import admm_two_level
from exaadmm_tpu.models.acopf import model as M
from exaadmm_tpu.utils.environment import IterationInformation, Parameters
from exaadmm_tpu.utils.synthetic import synthetic_case


def test_synthetic_admm_converges():
    data = synthetic_case(300, seed=0)
    par = Parameters(verbose=0, outer_iterlim=20, inner_iterlim=200,
                     tron_step_cap=48)
    model = M.build_model(data, par)
    sol = M.init_solution(model, 4e2, 4e4)
    sol, info = admm_two_level(model, sol, IterationInformation())
    assert info.status == "Solved"
    assert info.objval > 0
