"""Benchmark: ADMM inner iterations/sec at case9241pegase scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Grid: synthetic 9241-bus / ~16k-line case (pegase9241 dimensions; the real
MATPOWER artifact is not redistributable in this zero-egress image). The
timed region is the full jitted inner ADMM loop — batched branch TRON/ALM
solves, bus consensus, z/l/residual updates — in steady state (warm
multipliers), matching how the reference's per-iteration cost is dominated
by its branch kernel (SURVEY.md §3.2).

Baseline: the reference repo publishes no wall-clock numbers (BASELINE.md);
its papers report ~100 ADMM iterations/sec on 9241pegase on V100/A100-class
GPUs (arXiv:2110.06879 reports ~0.01 s/iteration at that scale).
vs_baseline is measured iters/sec divided by that 100 it/s proxy.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_ITERS_PER_SEC = 100.0
NBUS = int(os.environ.get("BENCH_NBUS", 9241))
INNER_ITERS = int(os.environ.get("BENCH_INNER", 20))
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))


def main():
    from exaadmm_tpu.algorithms.admm_two_level import make_inner_loop
    from exaadmm_tpu.models.acopf import model as M
    from exaadmm_tpu.utils.environment import Parameters
    from exaadmm_tpu.utils.synthetic import synthetic_case

    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    data = synthetic_case(NBUS, seed=0)
    par = Parameters(verbose=0,
                     tron_step_cap=int(os.environ.get("BENCH_STEP_CAP", 24)),
                     branch_backend=os.environ.get("BENCH_BACKEND", "pallas"),
                     pallas_tile=int(os.environ.get("BENCH_TILE", 1024)),
                     sort_lines=os.environ.get("BENCH_SORT", "1") == "1")
    model = M.build_model(data, par, dtype=dtype)
    sol = M.init_solution(model, 400.0, 40000.0)
    par.scale = 1e-4

    run_inner = make_inner_loop(model, INNER_ITERS)
    beta = jnp.asarray(1e3, dtype)
    gd = model.grid
    args = (gd.Pd, gd.Qd, gd.pgmin, gd.pgmax)
    line_ids = jnp.arange(gd.nline_padded, dtype=jnp.int32)
    lane_steps = jnp.zeros((gd.nline_padded,), jnp.int32)

    # warm-up: compiles and runs outer=1 (mu reset path) + steady state
    carry = run_inner(sol, beta, jnp.asarray(1.0, dtype), *args,
                      line_ids, lane_steps)
    jax.block_until_ready(carry)
    sol = carry.sol

    best = 0.0
    total_iters = 0
    for rep in range(REPEATS):
        t0 = time.perf_counter()
        carry = run_inner(sol, beta, jnp.asarray(2.0 + rep, dtype), *args,
                          carry.line_ids, carry.lane_steps)
        jax.block_until_ready(carry)
        dt_s = time.perf_counter() - t0
        iters = int(carry.inner)
        total_iters += iters
        best = max(best, iters / dt_s)
        sol = carry.sol

    value = best
    print(json.dumps({
        "metric": f"admm_inner_iters_per_sec_synth{NBUS}bus_{data.nline}line",
        "value": round(value, 3),
        "unit": "iters/s",
        "vs_baseline": round(value / BASELINE_ITERS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
