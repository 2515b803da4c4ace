"""Interleaved A/B benchmark for inner-loop variants.

The axon tunnel's dispatch latency drifts by 2x across processes and over
time, so variants must be compared round-robin inside one process, taking
each variant's best rep. Usage:

    python tools/ab_bench.py "name=k1:v1,k2:v2" "name2=..." [--rounds N]

Each spec sets Parameters fields (ints/floats/bools/None) for one variant;
everything else follows bench.py defaults (synthetic 9241-bus case, fp32,
pallas backend, 20-iteration dispatches, steady-state warm-up).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def parse_val(v):
    if v == "None":
        return None
    if v in ("True", "False"):
        return v == "True"
    if "+" in v:  # tuple syntax: 22+10+20
        return tuple(parse_val(x) for x in v.split("+"))
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v  # plain string field (e.g. bus_backend)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("specs", nargs="+")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--nbus", type=int, default=9241)
    ap.add_argument("--inner", type=int, default=20)
    args = ap.parse_args()

    from exaadmm_tpu.algorithms.admm_two_level import make_inner_loop
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
                         branch_backend="pallas", pallas_tile=1024)
        for k, v in overrides.items():
            setattr(par, k, v)
        model = M.build_model(data, par, dtype=jnp.float32)
        sol = M.init_solution(model, 400.0, 40000.0)
        par.scale = 1e-4
        run = make_inner_loop(model, args.inner)
        gd = model.grid
        state = dict(
            name=name, run=run, sol=sol,
            args=(gd.Pd, gd.Qd, gd.pgmin, gd.pgmax),
            ids=jnp.arange(gd.nline_padded, dtype=jnp.int32),
            steps=jnp.zeros((gd.nline_padded,), jnp.int32),
            best=0.0, outer=2.0,
        )
        variants.append(state)

    beta = jnp.asarray(1e3, jnp.float32)
    # compile + steady-state warm-up for every variant first
    for v in variants:
        carry = v["run"](v["sol"], beta, jnp.asarray(1.0, jnp.float32),
                         *v["args"], v["ids"], v["steps"])
        jax.block_until_ready(carry)
        v["sol"], v["ids"], v["steps"] = carry.sol, carry.line_ids, carry.lane_steps

    for rnd in range(args.rounds):
        for v in variants:
            t0 = time.perf_counter()
            carry = v["run"](v["sol"], beta, jnp.asarray(v["outer"], jnp.float32),
                             *v["args"], v["ids"], v["steps"])
            jax.block_until_ready(carry)
            dt = time.perf_counter() - t0
            v["best"] = max(v["best"], int(carry.inner) / dt)
            v["sol"], v["ids"], v["steps"] = carry.sol, carry.line_ids, carry.lane_steps
            v["outer"] += 1.0

    for v in variants:
        print(f"{v['name']:28s} {v['best']:8.1f} it/s (best of {args.rounds})")


if __name__ == "__main__":
    main()
