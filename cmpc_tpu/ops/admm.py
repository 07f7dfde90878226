"""Batched OSQP-style ADMM quadratic-program solver, pure JAX.

The TPU-native replacement for the reference's native QP/NLP backends
(OSQP via CasADi, utils.py:40-92; inner iterations of IPOPT).  Solves

    min 1/2 x^T P x + q^T x    s.t.  l <= A x <= u

with the operator-splitting scheme of OSQP (Stellato et al., 2020):
modified Ruiz equilibration, one dense factorization of
(P + sigma*I + A^T diag(rho) A) per call, then fixed-count matrix-vector
iterations — every step is a batched matmul, so thousands of scenarios run
in lockstep on the MXU under vmap with no data-dependent control flow
(fixed iteration count instead of a tolerance exit keeps the batch
converged together; SURVEY.md §7 hard part #3).

Equality rows (l == u) get a 1e3-boosted rho, matching OSQP's default
treatment.  Ruiz scaling is essential here: the MPC mixes ~1e2 N contact
forces with ~5e-5 m stance boxes in one variable/constraint stack, and the
unscaled problem stalls around 1e-1 primal residual.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# QP iterations need true fp32 accumulation: on TPU the default matmul
# precision demotes f32 operands to bf16 multiplies, which stalls ADMM
# convergence around 1e-2.  All solver matmuls request HIGHEST.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


class ADMMSettings(NamedTuple):
    iters: int = 50
    rho: float = 10.0
    sigma: float = 1e-6
    alpha: float = 1.6
    eq_rho_scale: float = 1e3
    ruiz_iters: int = 10
    # Primal-dual active-set (PDAS) refinement, batched: each round guesses
    # the active set from (x, y) with the semismooth-Newton rule
    # act_u = {y + c(Ax-u) > 0}, act_l = {y + c(Ax-l) < 0}, then re-solves
    # with active rows enforced by a large quadratic penalty (a fixed-shape
    # stand-in for the exact equality KKT solve — active-set sizes differ
    # per scenario, so the penalty keeps every scenario on one dense
    # factorization shape).  Converges in ~3 rounds on the MPC QPs and can
    # both add and release rows; the ADMM phase supplies a sane (x, y).
    pdas_rounds: int = 3
    pdas_weight: float = 1e5
    pdas_c: float = 1.0


class ADMMResult(NamedTuple):
    x: jnp.ndarray        # primal solution
    y: jnp.ndarray        # dual (for warm starting)
    zc: jnp.ndarray       # projected constraint values (unscaled rows)
    r_prim: jnp.ndarray   # ||Ax - z||_inf (unscaled)
    r_dual: jnp.ndarray   # ||Px + q + A'y||_inf (unscaled)


def _ruiz(P, q, A, l, u, iters: int):
    """Modified Ruiz equilibration (OSQP §5.1): iteratively scale variables
    by D and constraint rows by E so the KKT matrix has ~unit inf-norm
    rows/cols, then scale the cost by c."""
    n, m = P.shape[0], A.shape[0]
    D = jnp.ones(n)
    E = jnp.ones(m)

    def body(_, carry):
        P, q, A, D, E = carry
        # column norms of [P; A] per variable
        cn = jnp.maximum(jnp.max(jnp.abs(P), axis=0),
                         jnp.max(jnp.abs(A), axis=0))
        # leave all-zero columns/rows (Gamma-gated constraints in swing
        # phases) unscaled — 1/sqrt(0) would overflow f32 after a few
        # iterations and poison the bounds with inf*0 = nan
        d = jnp.where(cn < 1e-10, 1.0, 1.0 / jnp.sqrt(jnp.maximum(cn, 1e-10)))
        d = jnp.clip(d, 1e-3, 1e3)
        rn = jnp.max(jnp.abs(A), axis=1)
        e = jnp.where(rn < 1e-10, 1.0, 1.0 / jnp.sqrt(jnp.maximum(rn, 1e-10)))
        e = jnp.clip(e, 1e-3, 1e3)
        P = P * d[:, None] * d[None, :]
        q = q * d
        A = A * e[:, None] * d[None, :]
        return P, q, A, D * d, E * e

    P, q, A, D, E = jax.lax.fori_loop(0, iters, body, (P, q, A, D, E))
    # cost scaling
    cn = jnp.mean(jnp.max(jnp.abs(P), axis=0))
    c = 1.0 / jnp.maximum(jnp.maximum(cn, jnp.max(jnp.abs(q))), 1e-8)
    c = jnp.clip(c, 1e-6, 1e6)
    P = P * c
    q = q * c
    return P, q, A, E * l, E * u, D, E, c


def admm_solve(P, q, A, l, u, x0, y0, settings: ADMMSettings) -> ADMMResult:
    """One QP solve. All inputs are per-scenario (vmap over a batch axis).

    x0: primal warm start; y0: dual warm start, both in *unscaled* space.
    """
    P0, q0, A0 = P, q, A
    P, q, A, l, u, D, E, c = _ruiz(P, q, A, l, u, settings.ruiz_iters)

    x = x0 / D
    y = c * y0 / E

    is_eq = (jnp.isfinite(l) & jnp.isfinite(u) & (jnp.abs(u - l) < 1e-9))
    rho = jnp.where(is_eq, settings.rho * settings.eq_rho_scale,
                    settings.rho)
    sigma = settings.sigma
    alpha = settings.alpha

    M = P + sigma * jnp.eye(P.shape[0]) + _mm(A.T * rho, A)
    # One dense factorization per solve; explicit inverse so that the fixed
    # ADMM iterations are pure matmuls (batched well on the MXU).
    Minv = jnp.linalg.inv(M)

    zc = jnp.clip(_mm(A, x), l, u)

    def body(_, carry):
        x, zc, y = carry
        rhs = sigma * x - q + _mm(A.T, rho * zc - y)
        xt = _mm(Minv, rhs)
        axt = _mm(A, xt)
        x_new = alpha * xt + (1 - alpha) * x
        zt = alpha * axt + (1 - alpha) * zc
        z_new = jnp.clip(zt + y / rho, l, u)
        y_new = y + rho * (zt - z_new)
        return (x_new, z_new, y_new)

    x, zc, y = jax.lax.fori_loop(0, settings.iters, body, (x, zc, y))

    # ---- PDAS refinement rounds ----
    fin_l = jnp.isfinite(l)
    fin_u = jnp.isfinite(u)
    w_act = settings.pdas_weight
    cpen = settings.pdas_c
    free = ~is_eq

    def pdas_round(carry, _):
        xp, yp = carry
        ax = _mm(A, xp)
        act_u = fin_u & free & (yp + cpen * (ax - u) > 0)
        act_l = fin_l & free & (yp + cpen * (ax - l) < 0)
        act = is_eq | act_u | act_l
        tgt = jnp.where(is_eq, jnp.where(fin_l, l, 0.0),
                        jnp.where(act_u, jnp.where(fin_u, u, 0.0),
                                  jnp.where(fin_l, l, 0.0)))
        W = jnp.where(act, w_act, 0.0)
        Mp = P + 1e-7 * jnp.eye(P.shape[0]) + _mm(A.T * W, A)
        xp = jnp.linalg.solve(Mp, -q + _mm(A.T, W * tgt))
        yp = W * (_mm(A, xp) - tgt)
        return (xp, yp), None

    if settings.pdas_rounds > 0:
        (xp, yp), _ = jax.lax.scan(pdas_round, (x, y), None,
                                   length=settings.pdas_rounds)
        # accept only if finite and not much less feasible than the ADMM
        # iterate (the active-set guess can be inconsistent on degenerate
        # problems); the ADMM iterate is the fallback
        def viol(v):
            av = _mm(A, v)
            return jnp.max(jnp.abs(jnp.clip(av, l, u) - av))
        ok = jnp.all(jnp.isfinite(xp)) & (viol(xp)
                                          < jnp.maximum(1e-3, viol(x)))
        x = jnp.where(ok, xp, x)
        y = jnp.where(ok, yp, y)
        zc = jnp.clip(_mm(A, x), l, u)

    x_out = D * x
    y_out = E * y / c
    r_prim = jnp.max(jnp.abs(_mm(A0, x_out) - zc / E))
    r_dual = jnp.max(jnp.abs(_mm(P0, x_out) + q0 + _mm(A0.T, y_out)))
    return ADMMResult(x=x_out, y=y_out, zc=zc / E, r_prim=r_prim,
                      r_dual=r_dual)
