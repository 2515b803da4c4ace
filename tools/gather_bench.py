"""Microbenchmark: per-call vs per-row cost of TPU gathers / segment-sums.

Decides whether bus-update traffic should be packed into fewer, wider
gather/scatter calls (per-call dominated) or left as-is (per-row dominated).
Chains calls inside one jitted fori_loop so dispatch overhead cancels.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = int(os.environ.get("BENCH_ROWS", 16384))
NBUS = int(os.environ.get("BENCH_SEGS", 9241))
W = int(os.environ.get("BENCH_WIDTH", 8))
REPS = 30


def timeit(name, fn, *args):
    f = jax.jit(lambda a: lax.fori_loop(0, REPS, lambda i, x: fn(x), a))
    r = f(*args)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:44s} {best*1e6:9.1f} us/iter")
    return best


def main():
    rng = np.random.default_rng(0)
    idx1 = jnp.asarray(rng.integers(0, NBUS, N), jnp.int32)
    idx2 = jnp.asarray(rng.integers(0, NBUS, N), jnp.int32)
    idx_cat = jnp.concatenate([idx1, idx2])
    x = jnp.asarray(rng.standard_normal((NBUS, W)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)

    # -- gathers ----------------------------------------------------------
    timeit("gather 2 calls x N rows, width 8",
           lambda a: a.at[0, 0].add(a[idx1].sum() + a[idx2].sum()), x)
    timeit("gather 1 call x 2N rows, width 8",
           lambda a: a.at[0, 0].add(a[idx_cat].sum()), x)
    xw = jnp.concatenate([x, x], 1)
    timeit("gather 1 call x N rows, width 16",
           lambda a: a.at[0, 0].add(a[idx1].sum()), xw)

    # -- segment-sum scatters --------------------------------------------
    def seg(vals, ids):
        return jax.ops.segment_sum(vals, ids, num_segments=NBUS)

    timeit("segsum 2 calls x N rows, width 8",
           lambda a: a + seg(v + a[0, 0] * 1e-20, idx1)
           + seg(v, idx2), x)
    vcat = jnp.concatenate([v, v], 0)
    timeit("segsum 1 call x 2N rows, width 8",
           lambda a: a + seg(jnp.concatenate([v + a[0, 0] * 1e-20, v], 0),
                             idx_cat), x)
    vw = jnp.concatenate([v, v], 1)
    timeit("segsum 1 call x N rows, width 16",
           lambda a: a + jnp.concatenate(
               [jnp.zeros((NBUS, 0), a.dtype),
                seg(vw + a[0, 0] * 1e-20, idx1)[:, :W]], 1), x)


if __name__ == "__main__":
    main()
