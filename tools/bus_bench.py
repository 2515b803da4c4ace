"""Microbenchmark: bus-update scatter/gather strategies on TPU.

The bus consensus update costs ~0.48 ms of a ~1.8 ms fused inner iteration
(tools/hook_bench.py), dominated by the fr/to line->bus segment-sum scatters
and the per-line writeback gathers — XLA TPU lowers both row-serially
(~8-10 ns/row regardless of row width).

Candidate replacement: express scatter/gather as MXU matmuls through a
Khatri-Rao factorization of the bus one-hot. With nbus padded to H*L
(L = 128 lanes), onehot(b) = onehot(b // L) (x) onehot(b % L), so

  scatter:  agg[h, l, c] = sum_n  Ahi[n,h] * Alo[n,l] * x[n,c]
            -> D[n, (h,c)] = Ahi[n,h]*x[n,c]  (small dense build)
               agg = D^T @ Alo                ((H*C, N) @ (N, L) matmul)
  gather:   g[n, c] = sum_{h,l} Ahi[n,h] Alo[n,l] w[h,l,c]
            -> E = Ahi @ w.reshape(H, L*C)    ((N, H) @ (H, L*C) matmul)
               g[n,c] = sum_l Alo[n,l] E[n,(l,c)]   (VPU contraction)

MAC count is N*nbus*C with zero lane padding (a plain one-hot matmul pays
N*nbus*128). fp32 exactness options: precision=HIGHEST (6-pass), HIGH
(3-pass), or a manual hi/lo bf16 split of the data operand (2 bf16 passes,
~16 mantissa bits — the one-hot operand is exact in bf16).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

N = int(os.environ.get("BENCH_ROWS", 15710))
NBUS = int(os.environ.get("BENCH_SEGS", 9241))
W = int(os.environ.get("BENCH_WIDTH", 8))
REPS = 200
L = 128
H = -(-NBUS // L)
NBUS_PAD = H * L


def timeit(name, fn, *args):
    """Differential timing: the tunnel costs ~24 ms per DISPATCH regardless
    of work, so time fori_loop at two trip counts and take the slope."""
    lo, hi = 4, 4 + REPS

    def total(reps):
        f = jax.jit(lambda a, reps=reps: lax.fori_loop(
            0, reps, lambda i, x: fn(x), a))
        r = f(*args)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            r = f(*args)
            jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        return best

    t = (total(hi) - total(lo)) / (hi - lo)
    print(f"{name:52s} {t*1e6:9.1f} us/iter")
    return t


def main():
    rng = np.random.default_rng(0)
    fr = jnp.asarray(rng.integers(0, NBUS, N), jnp.int32)
    to = jnp.asarray(rng.integers(0, NBUS, N), jnp.int32)
    x = jnp.asarray(rng.standard_normal((N, W)), jnp.float32)
    wtm = jnp.asarray(rng.standard_normal((NBUS_PAD, 4)), jnp.float32)

    # one-hot factors (static constants in the real kernel; built on the fly
    # here so they are part of the timed loop — XLA hoists them anyway since
    # indices are loop-invariant, matching production where they are consts)
    def onehots(ids):
        hi = (ids // L).astype(jnp.int32)
        lo = (ids % L).astype(jnp.int32)
        Ahi = (hi[:, None] == jnp.arange(H)[None, :]).astype(jnp.float32)
        Alo = (lo[:, None] == jnp.arange(L)[None, :]).astype(jnp.float32)
        return Ahi, Alo

    Ahi_f, Alo_f = onehots(fr)
    Ahi_t, Alo_t = onehots(to)
    Ahi_f16, Alo_f16 = Ahi_f.astype(jnp.bfloat16), Alo_f.astype(jnp.bfloat16)
    Ahi_t16, Alo_t16 = Ahi_t.astype(jnp.bfloat16), Alo_t.astype(jnp.bfloat16)

    def seg(vals, ids):
        return jax.ops.segment_sum(vals, ids, num_segments=NBUS)

    # ---------------- scatter -------------------------------------------
    def pad_n(r):
        return jnp.pad(r, ((0, N - r.shape[0]), (0, 0)))

    timeit("scatter: segsum fr + segsum to (baseline)",
           lambda a: a + pad_n(seg(a + x, fr) + seg(x, to)), x)

    def kr_scatter(vals, Ahi, Alo, precision):
        # D[n, h*c] = Ahi[n,h] * vals[n,c];  agg[(h c), l] = D^T @ Alo
        D = (Ahi[:, :, None] * vals[:, None, :]).reshape(N, H * W)
        agg = jax.lax.dot_general(
            D, Alo, (((0,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32)
        return agg.reshape(H, W, L).transpose(0, 2, 1).reshape(NBUS_PAD, W)

    # --- decomposed KR costs + sorted-index variants ---
    fr_sorted = jnp.sort(fr)
    timeit("scatter: segsum fr+to, SORTED ids + hint",
           lambda a: a + pad_n(
               jax.ops.segment_sum(a + x, fr_sorted, num_segments=NBUS,
                                   indices_are_sorted=True)
               + jax.ops.segment_sum(x, fr_sorted, num_segments=NBUS,
                                     indices_are_sorted=True)), x)
    D_pre = (Ahi_f[:, :, None] * x[:, None, :]).reshape(N, H * W)
    timeit("scatter: KR D-build only (x2)",
           lambda a: a + pad_n(
               ((Ahi_f[:, :, None] * (a + x)[:, None, :]).reshape(N, H * W)
                [:, :W])
               + ((Ahi_t[:, :, None] * x[:, None, :]).reshape(N, H * W)
                  [:, :W])), x)
    timeit("scatter: KR matmul only (x2, pre-built D, bf16)",
           lambda a: a + pad_n(
               jax.lax.dot_general(
                   D_pre + a[0, 0] * 1e-20, Alo_f, (((0,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)
               .reshape(H, W, L).transpose(0, 2, 1).reshape(NBUS_PAD, W)
               + jax.lax.dot_general(
                   D_pre, Alo_t, (((0,), (0,)), ((), ())),
                   preferred_element_type=jnp.float32)
               .reshape(H, W, L).transpose(0, 2, 1).reshape(NBUS_PAD, W)), x)

    for prec, tag in [(jax.lax.Precision.DEFAULT, "bf16 1-pass"),
                      (jax.lax.Precision.HIGH, "3-pass"),
                      (jax.lax.Precision.HIGHEST, "6-pass")]:
        timeit(f"scatter: KR matmul fr+to ({tag})",
               lambda a, p=prec: a + pad_n(kr_scatter(a + x, Ahi_f, Alo_f, p)
                                           + kr_scatter(x, Ahi_t, Alo_t, p)), x)

    def kr_scatter_split(vals, Ahi, Alo):
        # manual hi/lo bf16 split of the data operand; one-hot side exact
        D = (Ahi[:, :, None] * vals[:, None, :]).reshape(N, H * W)
        Dhi = D.astype(jnp.bfloat16)
        Dlo = (D - Dhi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        agg = dot(Dhi, Alo) + dot(Dlo, Alo)
        return agg.reshape(H, W, L).transpose(0, 2, 1).reshape(NBUS_PAD, W)

    timeit("scatter: KR matmul fr+to (manual bf16 2-pass)",
           lambda a: a + pad_n(kr_scatter_split(a + x, Ahi_f16, Alo_f16)
                               + kr_scatter_split(x, Ahi_t16, Alo_t16)), x)

    # accuracy of each scatter variant vs fp64 reference
    x64 = np.asarray(x, np.float64)
    ref = np.zeros((NBUS_PAD, W))
    np.add.at(ref, np.asarray(fr), x64)
    exact = seg(x, fr)
    err_seg = float(jnp.max(jnp.abs(exact - ref[:NBUS]))) / float(np.abs(ref).max())
    for prec, tag in [(jax.lax.Precision.DEFAULT, "bf16 1-pass"),
                      (jax.lax.Precision.HIGH, "3-pass"),
                      (jax.lax.Precision.HIGHEST, "6-pass")]:
        got = kr_scatter(x, Ahi_f, Alo_f, prec)
        err = float(jnp.max(jnp.abs(got - ref))) / float(np.abs(ref).max())
        print(f"   scatter accuracy {tag:16s}: rel max err {err:.2e} "
              f"(segsum itself: {err_seg:.2e})")
    got = kr_scatter_split(x, Ahi_f16, Alo_f16)
    err = float(jnp.max(jnp.abs(got - ref))) / float(np.abs(ref).max())
    print(f"   scatter accuracy manual 2-pass   : rel max err {err:.2e}")

    # ---------------- gather --------------------------------------------
    timeit("gather: wtm[fr] + wtm[to] (baseline)",
           lambda a: a + jnp.concatenate(
               [a[fr][:, :4] * 1e-20 + wtm[fr], wtm[to]], 1),
           jnp.zeros((N, 8), jnp.float32))

    def kr_gather(w, Ahi, Alo, precision):
        E = jax.lax.dot_general(
            Ahi, w.reshape(H, L * 4), (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        return jnp.einsum("nlc,nl->nc", E.reshape(N, L, 4),
                          Alo.astype(jnp.float32))

    for prec, tag in [(jax.lax.Precision.DEFAULT, "bf16 1-pass"),
                      (jax.lax.Precision.HIGH, "3-pass")]:
        timeit(f"gather: KR matmul fr+to ({tag})",
               lambda a, p=prec: a + jnp.concatenate(
                   [kr_gather(wtm + a[0, 0] * 1e-20, Ahi_f, Alo_f, p),
                    kr_gather(wtm, Ahi_t, Alo_t, p)], 1),
               jnp.zeros((N, 8), jnp.float32))

    def kr_gather_split(w, Ahi, Alo):
        whi = w.astype(jnp.bfloat16)
        wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda a, b: jax.lax.dot_general(  # noqa: E731
            a, b.reshape(H, L * 4), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        E = dot(Ahi, whi) + dot(Ahi, wlo)
        return jnp.einsum("nlc,nl->nc", E.reshape(N, L, 4),
                          Alo.astype(jnp.float32))

    timeit("gather: KR matmul fr+to (manual bf16 2-pass)",
           lambda a: a + jnp.concatenate(
               [kr_gather_split(wtm + a[0, 0] * 1e-20, Ahi_f16, Alo_f16),
                kr_gather_split(wtm, Ahi_t16, Alo_t16)], 1),
           jnp.zeros((N, 8), jnp.float32))

    timeit("gather: wtm[fr] SORTED + hint (x2)",
           lambda a: a + jnp.concatenate(
               [a[fr_sorted][:, :4] * 1e-20
                + jnp.take(wtm, fr_sorted, axis=0, indices_are_sorted=True),
                jnp.take(wtm, fr_sorted, axis=0, indices_are_sorted=True)], 1),
           jnp.zeros((N, 8), jnp.float32))

    refg = np.asarray(wtm, np.float64)[np.asarray(fr)]
    for fn, tag in [
        (lambda: kr_gather(wtm, Ahi_f, Alo_f, jax.lax.Precision.HIGH), "3-pass"),
        (lambda: kr_gather_split(wtm, Ahi_f16, Alo_f16), "manual 2-pass"),
    ]:
        err = float(jnp.max(jnp.abs(fn() - refg))) / float(np.abs(refg).max())
        print(f"   gather accuracy {tag:16s}: rel max err {err:.2e}")


if __name__ == "__main__":
    main()
