"""Unrolled dense linear algebra for tiny batched systems (n <= ~8).

XLA's generic ``jnp.linalg.cholesky`` lowers small batched factorizations to
loopy code that is slow on TPU (and fp64 there is software-emulated); for the
6x6 branch Hessians we instead unroll the factorization/solves at trace time
into pure vector ops over the batch lane — everything maps onto the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def cholesky_unrolled(A: jnp.ndarray, eps: float = 0.0):
    """Batched lower-Cholesky of (B, n, n) SPD matrices, unrolled over n.

    Returns (L, ok) where ``ok`` is a (B,) bool marking lanes whose pivots all
    stayed above ``eps`` (non-PD lanes get garbage in L; callers must mask).
    """
    n = A.shape[-1]
    B = A.shape[0]
    L = [[None] * n for _ in range(n)]
    ok = jnp.ones((B,), dtype=bool)
    for j in range(n):
        s = A[:, j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        ok = ok & (s > eps)
        piv = jnp.sqrt(jnp.where(s > eps, s, 1.0))
        L[j][j] = piv
        inv_piv = 1.0 / piv
        for i in range(j + 1, n):
            t = A[:, i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv_piv
    rows = []
    zeros = jnp.zeros((B,), dtype=A.dtype)
    for i in range(n):
        rows.append(jnp.stack([L[i][j] if j <= i else zeros for j in range(n)], axis=-1))
    return jnp.stack(rows, axis=-2), ok


def cho_solve_unrolled(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L L^T x = b for batched (B, n, n) lower L and (B, n) b, unrolled."""
    n = L.shape[-1]
    y = [None] * n
    for i in range(n):
        t = b[:, i]
        for k in range(i):
            t = t - L[:, i, k] * y[k]
        y[i] = t / L[:, i, i]
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[:, k, i] * x[k]
        x[i] = t / L[:, i, i]
    return jnp.stack(x, axis=-1)


def solve_spd_shifted(H: jnp.ndarray, rhs: jnp.ndarray):
    """Solve (H + tau*I) x = rhs with the smallest shift tau from a fixed
    ladder that renders the matrix PD, per batch lane.

    Mirrors the role of TRON's shifted incomplete Cholesky (dicfs); with n=6
    a dense shifted Cholesky is exact and cheap. Returns (x, ok) where ok
    marks lanes solvable at some ladder level (others get x=0).
    """
    B, n, _ = H.shape
    eye = jnp.eye(n, dtype=H.dtype)
    diag = jnp.abs(jnp.diagonal(H, axis1=-2, axis2=-1))
    dmax = jnp.maximum(jnp.max(diag, axis=-1), 1.0)

    x = jnp.zeros_like(rhs)
    solved = jnp.zeros((B,), dtype=bool)
    for level in (0.0, 1e-10, 1e-6, 1e-3, 1.0, 1e3):
        tau = dmax * level
        Ls, ok = cholesky_unrolled(H + tau[:, None, None] * eye)
        cand = cho_solve_unrolled(Ls, rhs)
        take = ok & ~solved
        x = jnp.where(take[:, None], cand, x)
        solved = solved | ok
    return x, solved
