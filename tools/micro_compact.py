"""Micro-benchmark: stable-partition index build for two-pass compaction.

The branch two-pass driver needs the indices of the first tail_cap
unfinished lanes (stable order). Candidates, all semantically identical:
  a) argsort of the 0/1 key (current)
  b) lax.top_k on the boolean key (descending value, ascending index ties)
  c) cumsum + searchsorted
Times each inside one fori_loop chain on the TPU (slope method, dispatch
overhead cancels).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

B = int(os.environ.get("B", 16384))
K = int(os.environ.get("K", 1024))
N = int(os.environ.get("N", 200))

rng = np.random.default_rng(0)
unf = jnp.asarray(rng.random(B) < 0.36)


def via_argsort(u):
    return jnp.argsort(jnp.where(u, 0, 1))[:K]


def via_topk(u):
    _, idx = lax.top_k(u.astype(jnp.int32), K)
    return idx


def via_cumsum(u):
    cs = jnp.cumsum(u.astype(jnp.int32))
    # index of the (s+1)-th unfinished lane; falls back to trailing finished
    # lanes when fewer than K are unfinished (same as the argsort tail)
    tgt = jnp.arange(1, K + 1, dtype=jnp.int32)
    idx = jnp.searchsorted(cs, tgt)
    total = cs[-1]
    # pad slots beyond `total` with the first finished lanes, stable
    fin_idx = jnp.argsort(jnp.where(u, 1, 0))[:K]
    return jnp.where(tgt <= total, idx, fin_idx)


def timeit(name, fn):
    @jax.jit
    def chain(u):
        def body(i, carry):
            u_c, acc = carry
            idx = fn(u_c)
            # feed the result back so nothing is hoisted
            u_c = u_c ^ (jnp.zeros_like(u_c).at[idx[0]].set(True))
            return (u_c, acc + idx[0])
        return lax.fori_loop(0, N, body, (u, jnp.zeros((), jnp.int32)))

    r = chain(unf)
    jax.block_until_ready(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = chain(unf)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{name:12s} {best*1e6:8.1f} us")
    return best


a = timeit("argsort", via_argsort)
b = timeit("top_k", via_topk)
c = timeit("cumsum", via_cumsum)
# sanity: same indices
ia = np.asarray(via_argsort(unf))
ib = np.asarray(via_topk(unf))
ic = np.asarray(via_cumsum(unf))
print("identical:", np.array_equal(ia, ib), np.array_equal(ia, ic))
