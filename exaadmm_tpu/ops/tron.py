"""Batched trust-region Newton (TRON-style) with an augmented-Lagrangian wrapper.

This is the TPU-native replacement for the reference's device-resident ExaTron
solver (the external ``ExaTron`` package: ``dtron``/``dcauchy``/``dspcg``/
``dgpnorm``; call sites at
``/root/reference/src/models/acopf/acopf_tron_linelimit_kernel.jl:61-144``) and
for the per-line ALM loop that wraps it
(``acopf_auglag_linelimit_kernel_cpu.jl:120-156``).

Design: instead of one CUDA block per subproblem running divergent loops, ALL
subproblems advance in lockstep through a single flat state machine inside one
``lax.while_loop`` whose body is fully batched. Each lane (subproblem)
carries its own phase (TRON minor iteration vs ALM multiplier round vs done);
the loop runs until every lane finishes — uniform control flow at the cost of
masked work for early finishers.

LAYOUT: everything is transposed, "rows" layout — iterates are (n, B), the
Hessian is (n, n, B), parameters are (..., B). The batch dimension B is
minor-most so it maps onto the TPU's 128-wide vector lanes; with the natural
(B, n) layout the VPU would idle 122 of 128 lanes (n=6). All dense 6x6
factorizations unroll to scalar-per-row ops on (B,) vectors.

Derivatives come from autodiff in the same layout:
  gradient: d/dX sum_b f_b(X)  ->  (n, B), exact per-lane gradients since f
  is elementwise over lanes;
  Hessian: n Hessian-vector products jvp(grad, e_j)  ->  (n, n, B).

Algorithm per lane (faithful to Lin & More's TRON as used by ExaTron):
  - Cauchy point along the projected gradient with sufficient decrease
    (mu0 = 0.01, interpolation x0.1 / extrapolation x10, warm-started step),
  - Newton step on the free variables via shifted dense Cholesky, clipped to
    the trust region, then a projected backtracking search,
  - actual/predicted reduction ratio tests with TRON's radius-update
    constants (eta0=1e-4, eta1=0.25, eta2=0.75, sigma1=0.25, sigma2=0.5,
    sigma3=4),
  - termination on projected-gradient inf-norm <= gtol, relative function
    reduction <= frtol, or the minor-iteration cap,
  - ALM round on TRON convergence: lambda += mu*c when ||c||_inf <= eta
    (Lancelot eta-ladder eta /= mu^0.9), else mu = min(10*mu, mu_max) with
    eta = mu^-0.1; a lane finishes when ||c||_inf <= ctol or the round cap.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# TRON constants (Lin & More)
_MU0 = 0.01       # sufficient decrease for Cauchy/projected searches
_INTERPF = 0.1
_EXTRAPF = 10.0
_ETA0, _ETA1, _ETA2 = 1e-4, 0.25, 0.75
_SIGMA1, _SIGMA2, _SIGMA3 = 0.25, 0.5, 4.0
_CAUCHY_ITERS = 22
_EXTRAP_ITERS = 10
_PRSRCH_ITERS = 20


class TronALMResult(NamedTuple):
    x: jnp.ndarray       # (n, B) final iterates
    lam: jnp.ndarray     # (ncon, B) ALM multipliers
    mu: jnp.ndarray      # (B,) ALM penalties
    minor_iters: jnp.ndarray  # (B,) total TR iterations
    alm_iters: jnp.ndarray    # (B,) ALM rounds taken
    cviol: jnp.ndarray   # (B,) final constraint inf-norm


class _State(NamedTuple):
    # NOTE: the boolean lane masks (tron_done/need_init/active) are carried
    # as 0/1 floats, not bools — Mosaic cannot legalize i1 vector yields in
    # loop carries when this state machine runs inside a Pallas kernel.
    x: jnp.ndarray
    f: jnp.ndarray
    delta: jnp.ndarray
    alpha_c: jnp.ndarray
    tron_it: jnp.ndarray
    tron_done: jnp.ndarray   # float 0/1
    need_init: jnp.ndarray   # float 0/1
    lam: jnp.ndarray
    mu: jnp.ndarray
    eta: jnp.ndarray
    alm_it: jnp.ndarray
    active: jnp.ndarray      # float 0/1
    minor_total: jnp.ndarray
    cviol: jnp.ndarray
    steps: jnp.ndarray


def _gp_norm_inf(x, g, xl, xu):
    gp = g
    gp = jnp.where(x <= xl, jnp.minimum(g, 0.0), gp)
    gp = jnp.where(x >= xu, jnp.maximum(gp, 0.0), gp)
    return jnp.max(jnp.abs(gp), axis=0)


def _norm2(s):
    return jnp.sqrt(jnp.sum(s * s, axis=0))


def _chol_solve_rows(H, rhs, tau):
    """Solve (H + tau*I) d = rhs per lane; H (n,n,B) rows layout, rhs (n,B).

    Unrolled dense Cholesky on (B,)-vector scalars; returns (d, ok) where ok
    marks lanes whose pivots stayed positive.
    """
    n = len(H)
    L = [[None] * n for _ in range(n)]
    inv_diag = [None] * n
    ok = jnp.ones(rhs.shape[-1], dtype=bool)
    for j in range(n):
        s = H[j][j] + tau
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        ok = ok & (s > 0)
        piv = jnp.sqrt(jnp.where(s > 0, s, 1.0))
        inv_piv = 1.0 / piv
        inv_diag[j] = inv_piv
        for i in range(j + 1, n):
            t = H[i][j]
            for k in range(j):
                t = t - L[i][k] * L[j][k]
            L[i][j] = t * inv_piv
    y = [None] * n
    for i in range(n):
        t = rhs[i]
        for k in range(i):
            t = t - L[i][k] * y[k]
        y[i] = t * inv_diag[i]
    d = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[k][i] * d[k]
        d[i] = t * inv_diag[i]
    return jnp.stack(d, axis=0), ok


def _newton_dir_rows(H, rhs):
    """Smallest-shift Newton direction (rows layout). Mirrors TRON's shifted
    incomplete Cholesky (dicfs); dense+exact here since n<=6.

    The free-variable Hessian is PD at shift 0 for the vast majority of lanes
    (the proximal rho terms dominate), so the escalating-shift ladder runs as
    a while-loop that exits as soon as every lane is factorized — one
    factorization per TR step in the common case instead of six. (A
    while-loop rather than lax.cond: Mosaic cannot legalize scf.if with
    vector results inside Pallas kernels; masks carried as 0/1 floats for the
    same reason.)"""
    dtype = rhs.dtype
    diag = jnp.stack([jnp.abs(H[i][i]) for i in range(len(H))], axis=0)
    dmax = jnp.maximum(jnp.max(diag, axis=0), 1.0)
    # scalar selects rather than an indexed constant array: a traced-constant
    # array would be captured by the enclosing Pallas kernel (disallowed)
    LEVELS = (0.0, 1e-10, 1e-6, 1e-3, 1.0, 1e3)

    # peel the shift-0 factorization: the free-variable Hessian is PD at
    # shift 0 for nearly every lane, so the escalation loop below almost
    # never runs — its body stays out of the common path entirely
    d0, ok0 = _chol_solve_rows(H, rhs, jnp.zeros_like(dmax))
    d0 = jnp.where(ok0[None, :], d0, 0.0)

    def cond(carry):
        d, solved, idx = carry
        return (idx < len(LEVELS)) & (jnp.min(solved) < 0.5)

    def body(carry):
        d, solved, idx = carry
        solvedb = solved > 0.5
        lvl = jnp.zeros((), dtype)
        for k, v in enumerate(LEVELS):
            lvl = jnp.where(idx == k, v, lvl)
        cand, ok = _chol_solve_rows(H, rhs, dmax * lvl)
        take = ok & ~solvedb
        d = jnp.where(take[None, :], cand, d)
        return d, (solvedb | ok).astype(dtype), idx + 1

    d, solved, _ = lax.while_loop(
        cond, body, (d0, ok0.astype(dtype), jnp.ones((), jnp.int32)))
    return d, solved > 0.5


def tron_alm_batched(
    obj_fn: Callable,    # (x (n,B), params, lam (ncon,B), mu (B,)) -> (B,)
    cons_fn: Callable,   # (x (n,B), params) -> (ncon, B)
    x0: jnp.ndarray,     # (n, B)
    xl: jnp.ndarray,
    xu: jnp.ndarray,
    params,              # pytree, leaves (..., B) broadcastable in obj_fn
    lam0: jnp.ndarray,   # (ncon, B)
    mu0: jnp.ndarray,    # (B,)
    *,
    gtol: float = 1e-6,
    frtol: float = 1e-12,
    ctol: float = 1e-6,
    mu_max: float = 1e8,
    max_minor: int = 200,
    max_auglag: int = 50,
    step_cap: int | None = None,
    active0: jnp.ndarray | None = None,
    fgh_fn: Callable | None = None,
    trial_unroll: tuple[int, int, int] | None = None,
    alm_delta_fn: Callable | None = None,
) -> TronALMResult:
    """Solve B independent bound-constrained ALM problems in lockstep.

    ``obj_fn`` is the FULL augmented objective (base + lam.c + 0.5 mu |c|^2)
    written row-wise (x[0], x[1], ... are (B,) vectors); gradients and
    Hessians are derived from it by autodiff, replacing the reference's
    600-line hand-derived eval kernels (acopf_eval_linelimit_kernel_cpu.jl).
    Pass ``fgh_fn(x, params, lam, mu) -> (f, g, H_rows)`` to override the
    autodiff evaluation with hand-derived closed forms on the hot path
    (Hessian autodiff costs ~5x the primal; the closed forms ~1.5x).

    ``trial_unroll=(k_interp, k_extrap, k_prsrch)`` replaces the three
    data-dependent trial-search while-loops inside each trust-region step
    (Cauchy interpolation/extrapolation, projected backtracking) with
    fixed-trip masked unrolled searches — the fast mode for the Pallas
    kernel, where loop control runs on the scalar core and costs more than
    the loop bodies. With caps equal to the loop caps (22, 10, 20) results
    are bit-identical to the while-loop mode; smaller caps trade rare
    pathological-lane accuracy for uniform cost (the TR machinery absorbs a
    failed search by shrinking the radius).

    ``alm_delta_fn(c, lam_old, mu_old, lam_new, mu_new, params) -> (B,)``
    optionally supplies the exact objective change under a multiplier/penalty
    update (obj is affine in lam and mu at fixed x), replacing the full
    objective re-evaluation after each ALM round — the model knows its own
    scaling, the solver does not.
    """
    n, B = x0.shape
    dtype = x0.dtype
    ncon = lam0.shape[0]

    def f_batched(X, lam, mu):
        return obj_fn(X, params, lam, mu)

    def f_sum(X, lam, mu):
        return jnp.sum(obj_fn(X, params, lam, mu))

    grad_fn = jax.grad(f_sum, argnums=0)

    def grad_hess(X, lam, mu):
        if fgh_fn is not None:
            _, g, H = fgh_fn(X, params, lam, mu)
            return g, H
        g = grad_fn(X, lam, mu)
        eye = jnp.eye(n, dtype=dtype)
        cols = []
        for j in range(n):
            tangent = jnp.broadcast_to(eye[:, j][:, None], (n, B))
            _, hj = jax.jvp(lambda Y: grad_fn(Y, lam, mu), (X,), (tangent,))
            cols.append(hj)
        # H[i][j] is a (B,) vector: row i of H e_j
        H = [[cols[j][i] for j in range(n)] for i in range(n)]
        return g, H

    def hmatvec(H, s):
        out = []
        for i in range(n):
            acc = H[i][0] * s[0]
            for j in range(1, n):
                acc = acc + H[i][j] * s[j]
            out.append(acc)
        return jnp.stack(out, axis=0)

    def cviol_inf(X):
        c = cons_fn(X, params)
        if ncon == 0:
            return jnp.zeros((B,), dtype), c
        return jnp.max(jnp.abs(c), axis=0), c

    def tr_step(x, f, g, H, delta, alpha_c, lam, mu):
        def qval(s):
            return jnp.sum(g * s, axis=0) + 0.5 * jnp.sum(s * hmatvec(H, s), axis=0)

        def proj(y):
            return jnp.clip(y, xl, xu)

        def s_of(a):
            return proj(x - a[None, :] * g) - x

        def cauchy_ok(a):
            s = s_of(a)
            return (_norm2(s) <= delta) & (qval(s) <= _MU0 * jnp.sum(g * s, axis=0))

        # --- Cauchy point (dcauchy): warm-started alpha ---
        a0 = jnp.maximum(alpha_c, 1e-30)
        need_interp = ~cauchy_ok(a0)

        if trial_unroll is not None:
            # Fixed-trip masked searches: inside a Pallas kernel the
            # data-dependent while-loops cost more in scalar-core loop
            # control than their bodies do in VPU work (each trip is ~130
            # flops/lane); unrolling makes every candidate evaluation
            # independent and lets Mosaic pipeline them. Candidates come
            # from the same chained multiplications as the loops, so with
            # caps >= the loop caps the results are bit-identical.
            k_interp, k_extrap, k_prsrch = trial_unroll

            cand = a0
            a_interp = a0
            have = jnp.zeros((B,), bool)
            for _ in range(k_interp):
                cand = cand * _INTERPF
                okk = cauchy_ok(cand)
                a_interp = jnp.where(have, a_interp, cand)
                have = have | okk

            cand = a0
            a_extrap = a0
            prefix = ~need_interp
            for _ in range(k_extrap):
                cand = cand * _EXTRAPF
                prefix = prefix & cauchy_ok(cand) & (cand < 1e12)
                a_extrap = jnp.where(prefix, cand, a_extrap)
        else:
            # Interpolation (a *= 0.1 until acceptable) and extrapolation
            # (a *= 10 while acceptable) are mutually exclusive per lane, so
            # run them as ONE lockstep loop with a per-lane factor: each
            # lane's candidate sequence is unchanged (bit-identical results)
            # but the trip count is max(interp, extrap) instead of their
            # sum — one less data-dependent while-loop per TR step, whose
            # scalar-core control overhead is a measurable share of the
            # Pallas kernel's per-step cost.
            # float masks, not bool vectors: Mosaic cannot legalize selects
            # over i1 vectors inside Pallas loop bodies (same reason _State
            # carries 0/1 floats)
            needf = need_interp.astype(dtype)
            factor = needf * _INTERPF + (1.0 - needf) * _EXTRAPF

            def cauchy_cond(carry):
                a_best, cand, stop, k = carry
                return (jnp.min(stop) < 0.5) & (k < _CAUCHY_ITERS)

            def cauchy_body(carry):
                a_best, cand, stop, k = carry
                stopb = stop > 0.5
                needb = needf > 0.5
                cand2 = cand * factor
                ok = cauchy_ok(cand2)
                # interp lanes: track every candidate while searching (the
                # reference keeps the last trial even if the cap is hit),
                # stop at the first acceptable one
                take_i = needb & ~stopb
                # extrap lanes: keep the LAST acceptable candidate, stop on
                # the first failure (or the growth cap / trip cap)
                good_e = ok & (cand2 < 1e12)
                take_e = ~needb & ~stopb & good_e
                a_best = jnp.where(take_i | take_e, cand2, a_best)
                stop_i = (stopb | ok).astype(dtype)
                stop_e = (stopb | ~good_e
                          | (k + 1 >= _EXTRAP_ITERS)).astype(dtype)
                stop2 = jnp.where(needb, stop_i, stop_e)
                return a_best, cand2, stop2, k + 1

            alpha0, _, _, _ = lax.while_loop(
                cauchy_cond, cauchy_body,
                (a0, a0, jnp.zeros((B,), dtype), jnp.zeros((), jnp.int32)))
            a_interp = a_extrap = alpha0
        alpha = jnp.where(need_interp, a_interp, a_extrap)
        sc = s_of(alpha)
        xc = x + sc

        # --- Newton direction on free variables ---
        free = (xc > xl) & (xc < xu)        # (n, B)
        Hsc = hmatvec(H, sc)
        gc = g + Hsc
        gf = jnp.where(free, gc, 0.0)
        # mask H rows/cols: Hm[i][j] = H[i][j] * free_i * free_j + (i==j)*~free_i
        freef = free.astype(dtype)
        Hm = [
            [
                H[i][j] * freef[i] * freef[j]
                + (1.0 - freef[i] if i == j else 0.0)
                for j in range(n)
            ]
            for i in range(n)
        ]
        d, solved = _newton_dir_rows(Hm, -gf)
        d = jnp.where(free & solved[None, :], d, 0.0)

        # clip the combined step to the trust region (dtrqsol)
        dd = jnp.sum(d * d, axis=0)
        sd = jnp.sum(sc * d, axis=0)
        ss = jnp.sum(sc * sc, axis=0)
        rad = jnp.maximum(sd * sd + dd * (delta * delta - ss), 0.0)
        safe_dd = jnp.where(dd > 0, dd, 1.0)
        tau = jnp.where(dd > 0,
                        jnp.minimum((jnp.sqrt(rad) - sd) / safe_dd, 1.0), 0.0)
        d = d * jnp.maximum(tau, 0.0)[None, :]

        # --- projected backtracking from xc along d (dprsrch) ---
        # q_c via the cached H*sc (saves one hmatvec per step)
        q_c = jnp.sum(g * sc, axis=0) + 0.5 * jnp.sum(sc * Hsc, axis=0)

        if trial_unroll is not None:
            aw = jnp.ones((B,), dtype)
            s_best = sc
            found = jnp.zeros((B,), bool)
            for _ in range(k_prsrch):
                s_try = proj(xc + aw[None, :] * d) - x
                decr = qval(s_try) <= q_c + _MU0 * jnp.minimum(
                    jnp.sum(gc * (s_try - sc), axis=0), 0.0)
                take = decr & ~found
                s_best = jnp.where(take[None, :], s_try, s_best)
                found = found | decr
                aw = aw * 0.5
            s = jnp.where(found[None, :], s_best, sc)
        else:
            def prs_cond(carry):
                aw, best_s, found, k = carry
                return (jnp.min(found) < 0.5) & (k < _PRSRCH_ITERS)

            def prs_body(carry):
                aw, best_s, found, k = carry
                foundb = found > 0.5
                s_try = proj(xc + aw[None, :] * d) - x
                decr = qval(s_try) <= q_c + _MU0 * jnp.minimum(
                    jnp.sum(gc * (s_try - sc), axis=0), 0.0)
                take = decr & ~foundb
                best_s = jnp.where(take[None, :], s_try, best_s)
                return aw * 0.5, best_s, (foundb | decr).astype(dtype), k + 1

            aw0 = jnp.ones((B,), dtype)
            _, s_best, found, _ = lax.while_loop(
                prs_cond, prs_body,
                (aw0, sc, jnp.zeros((B,), dtype), jnp.zeros((), jnp.int32)))
            s = jnp.where(found[None, :] > 0.5, s_best, sc)

        # --- ratio test & radius update (dtron) ---
        xt = x + s
        ft = f_batched(xt, lam, mu)
        predred = -qval(s)
        actred = f - ft
        gts = jnp.sum(g * s, axis=0)
        snorm = _norm2(s)

        denom = ft - f - gts
        alpha_q = jnp.where(
            denom <= 0.0, _SIGMA3,
            jnp.maximum(_SIGMA1, -0.5 * gts / jnp.where(denom == 0, 1.0, denom)))
        safe_pred = jnp.where(predred != 0.0, predred, 1.0)
        ratio = jnp.where(predred > 0.0, actred / safe_pred, 0.0)

        delta_new = jnp.where(
            ratio <= _ETA0,
            jnp.minimum(jnp.maximum(alpha_q, _SIGMA1) * snorm, _SIGMA2 * delta),
            jnp.where(
                ratio < _ETA1,
                jnp.maximum(_SIGMA1 * delta,
                            jnp.minimum(alpha_q * snorm, _SIGMA2 * delta)),
                jnp.where(
                    ratio < _ETA2,
                    jnp.maximum(_SIGMA1 * delta,
                                jnp.minimum(alpha_q * snorm, _SIGMA3 * delta)),
                    jnp.maximum(delta,
                                jnp.minimum(alpha_q * snorm, _SIGMA3 * delta)),
                ),
            ),
        )
        delta_new = jnp.maximum(delta_new, 1e-30)

        accept = ratio > _ETA0
        x_new = jnp.where(accept[None, :], xt, x)
        f_new = jnp.where(accept, ft, f)
        frtol_conv = (predred <= frtol * jnp.abs(f)) | (
            accept & (actred <= frtol * jnp.abs(f)))
        return x_new, f_new, delta_new, alpha, frtol_conv

    def body(st: _State) -> _State:
        g, H = grad_hess(st.x, st.lam, st.mu)

        st_active = st.active > 0.5
        st_done = st.tron_done > 0.5
        st_init = st.need_init > 0.5

        gnorm = _norm2(g)
        delta = jnp.where(st_init, jnp.maximum(gnorm, 1e-12), st.delta)
        alpha_c = jnp.where(st_init, jnp.ones_like(st.alpha_c), st.alpha_c)

        gpn = _gp_norm_inf(st.x, g, xl, xu)
        tron_conv = gpn <= gtol
        stepping = st_active & ~st_done & ~tron_conv & (st.tron_it < max_minor)
        newly_done = st_active & ~st_done & (
            tron_conv | (st.tron_it >= max_minor))

        x2, f2, delta2, ac2, frtol_conv = tr_step(
            st.x, st.f, g, H, delta, alpha_c, st.lam, st.mu)
        x = jnp.where(stepping[None, :], x2, st.x)
        f = jnp.where(stepping, f2, st.f)
        delta = jnp.where(stepping, delta2, delta)
        alpha_c = jnp.where(stepping, ac2, alpha_c)
        tron_it = st.tron_it + stepping.astype(jnp.int32)
        minor_total = st.minor_total + stepping.astype(jnp.int32)
        need_init = st_init & ~stepping

        tron_done = st_done | newly_done | (stepping & frtol_conv)

        # --- ALM round for lanes whose TRON solve just finished ---
        do_alm = st_active & tron_done
        cnorm, c = cviol_inf(x)
        good = cnorm <= st.eta
        # reference nests the ctol test under the eta test
        # (acopf_auglag_linelimit_kernel_cpu.jl:128-137)
        line_solved = good & (cnorm <= ctol)

        upd_lam = do_alm & good & ~line_solved
        if ncon > 0:
            lam = jnp.where(upd_lam[None, :], st.lam + st.mu[None, :] * c, st.lam)
        else:
            lam = st.lam
        eta = jnp.where(upd_lam, st.eta / st.mu**0.9, st.eta)

        upd_mu = do_alm & ~good
        mu = jnp.where(upd_mu, jnp.minimum(mu_max, st.mu * 10.0), st.mu)
        eta = jnp.where(upd_mu, 1.0 / mu**0.1, eta)

        alm_it = st.alm_it + do_alm.astype(jnp.int32)
        finished = do_alm & (line_solved | (alm_it >= max_auglag))
        active = st_active & ~finished

        restart = do_alm & ~finished
        tron_done = tron_done & ~restart
        tron_it = jnp.where(restart, 0, tron_it)
        need_init = need_init | restart
        if alm_delta_fn is not None and ncon > 0:
            f_fresh = f + alm_delta_fn(c, st.lam, st.mu, lam, mu, params)
        else:
            f_fresh = f_batched(x, lam, mu)
        f = jnp.where(restart, f_fresh, f)
        cviol = jnp.where(do_alm, cnorm, st.cviol)

        return _State(
            x=x, f=f, delta=delta, alpha_c=alpha_c,
            tron_it=tron_it,
            tron_done=tron_done.astype(dtype),
            need_init=need_init.astype(dtype),
            lam=lam, mu=mu, eta=eta, alm_it=alm_it,
            active=active.astype(dtype),
            minor_total=minor_total, cviol=cviol, steps=st.steps + 1,
        )

    if step_cap is None:
        step_cap = max_minor * max_auglag

    def cond(st: _State):
        # float reduce instead of jnp.any: Mosaic's reduce_or proxy lowering
        # materializes an f64 temp when jax_enable_x64 is on globally
        # (mixed-precision fp64 solves), which it then cannot lower;
        # the masks are 0/1 floats so max/min reduces are equivalent
        return (jnp.max(st.active) > 0.5) & (st.steps < step_cap)

    f0 = f_batched(x0, lam0, mu0)
    if active0 is None:
        active0 = jnp.ones((B,), bool)
    st0 = _State(
        x=x0,
        f=f0,
        delta=jnp.zeros((B,), dtype),
        alpha_c=jnp.ones((B,), dtype),
        tron_it=jnp.zeros((B,), jnp.int32),
        tron_done=jnp.zeros((B,), dtype),
        need_init=jnp.ones((B,), dtype),
        lam=lam0,
        mu=mu0,
        eta=1.0 / mu0**0.1,
        alm_it=jnp.zeros((B,), jnp.int32),
        active=active0.astype(dtype),
        minor_total=jnp.zeros((B,), jnp.int32),
        cviol=jnp.full((B,), jnp.inf, dtype),
        steps=jnp.zeros((), jnp.int32),
    )
    st = lax.while_loop(cond, body, st0)
    return TronALMResult(
        x=st.x, lam=st.lam, mu=st.mu,
        minor_iters=st.minor_total, alm_iters=st.alm_it, cviol=st.cviol,
    )


def tron_batched(
    obj_fn: Callable,   # (x (n,B), params) -> (B,)
    x0, xl, xu, params, **kwargs
):
    """Plain bound-constrained batched TRON (no constraints/ALM), rows layout."""

    def obj_alm(x, p, lam, mu):
        del lam, mu
        return obj_fn(x, p)

    def cons(x, p):
        del p
        return jnp.zeros((0, x.shape[1]), x.dtype)

    B = x0.shape[1]
    lam0 = jnp.zeros((0, B), x0.dtype)
    mu0 = jnp.full((B,), 10.0, x0.dtype)
    kwargs.setdefault("max_auglag", 1)
    return tron_alm_batched(obj_alm, cons, x0, xl, xu, params, lam0, mu0, **kwargs)
