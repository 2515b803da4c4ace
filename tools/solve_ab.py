"""Full-solve A/B: wall time AND trajectory (cumul iters, mismatch, objval)
for Parameters variants, round-robin in one process (dispatch drift cancels).

Unlike ab_bench.py (steady-state it/s on fixed work) this runs the fused
production solver from the flat start to convergence/iteration limit — the
honest metric when a knob might trade per-iteration cost against trajectory
quality (e.g. branch_pass1_cap tail overflow).

    python tools/solve_ab.py "cap3" "cap2=branch_pass1_cap:2" --rounds 3
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ab_bench import parse_val  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("specs", nargs="+")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--nbus", type=int, default=9241)
    ap.add_argument("--outer", type=int, default=20)
    ap.add_argument("--inner", type=int, default=500)
    ap.add_argument("--outer_eps", type=float, default=2e-4)
    args = ap.parse_args()

    from exaadmm_tpu.algorithms.admm_two_level import make_fused_solver
    from exaadmm_tpu.models.acopf import model as M
    from exaadmm_tpu.utils.environment import Parameters
    from exaadmm_tpu.utils.synthetic import synthetic_case

    data = synthetic_case(args.nbus, seed=0)
    variants = []
    for spec in args.specs:
        name, _, kvs = spec.partition("=")
        overrides = {}
        if kvs:
            for kv in kvs.split(","):
                k, _, v = kv.partition(":")
                overrides[k] = parse_val(v)
        par = Parameters(verbose=0, tron_step_cap=24,
                         branch_backend="pallas", pallas_tile=1024,
                         outer_iterlim=args.outer, inner_iterlim=args.inner,
                         outer_eps=args.outer_eps)
        for k, v in overrides.items():
            setattr(par, k, v)
        model = M.build_model(data, par, dtype=jnp.float32)
        sol = M.init_solution(model, 400.0, 40000.0)
        par.scale = 1e-4
        run = make_fused_solver(model)
        gd = model.grid
        variants.append(dict(
            name=name, run=run, sol=sol,
            args=(gd.Pd, gd.Qd, gd.pgmin, gd.pgmax),
            best=float("inf"), out=None,
        ))

    for v in variants:  # compile
        out = v["run"](v["sol"], 1e3, *v["args"])
        jax.block_until_ready(out)
        v["out"] = out

    for r in range(args.rounds):
        for v in variants:
            t0 = time.perf_counter()
            out = v["run"](v["sol"], 1e3, *v["args"])
            jax.block_until_ready(out)
            v["best"] = min(v["best"], time.perf_counter() - t0)

    for v in variants:
        o = v["out"]
        cumul = int(o.cumul)
        print(f"{v['name']:24s} {v['best']:8.3f} s  cumul={cumul:6d} "
              f"outer={int(o.outer):3d} mismatch={float(o.mismatch):.4e} "
              f"obj={float(o.objval):.6e} it/s={cumul / v['best']:.1f}")


if __name__ == "__main__":
    main()
