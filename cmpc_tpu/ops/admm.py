"""Batched OSQP-style ADMM quadratic-program solver, pure JAX.

The TPU-native replacement for the reference's native QP/NLP backends
(OSQP via CasADi, utils.py:40-92; inner iterations of IPOPT).  Solves

    min 1/2 x^T P x + q^T x    s.t.  l <= A x <= u

with the operator-splitting scheme of OSQP (Stellato et al., 2020):
modified Ruiz equilibration, one LU factorization of the **KKT-form**
system per call, then fixed-count iterations — every scenario runs in
lockstep on the device under vmap with no data-dependent control flow
(fixed iteration count instead of a tolerance exit keeps the batch
converged together; SURVEY.md §7 hard part #3).

f32-first numerics (TPU native precision):

* The linear system is solved in KKT form  [[P+sI, A^T], [A, -1/rho]]
  like OSQP itself, NOT via the normal equations P + sI + A^T rho A.
  Forming A^T rho A squares the condition number — measured 1.2e11 vs
  5e4 for the KKT form on the whole-body ID QP — which is fatal in f32
  (the pre-KKT version produced 1e17 torques on TPU while passing all
  f64 CPU tests).
* sigma = 1e-4 (not OSQP's 1e-6): the splitting iteration absorbs the
  proximal bias, and the larger sigma caps the KKT condition number.
* One iterative-refinement step per solve backstops LU in f32.

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
from jax.scipy.linalg import lu_factor, lu_solve

# QP iterations need true fp32 accumulation: on TPU the default matmul
# precision demotes f32 operands to bf16 multiplies, which stalls ADMM
# convergence around 1e-2.  All solver matmuls request HIGHEST.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


class ADMMSettings(NamedTuple):
    iters: int = 50
    rho: float = 10.0
    sigma: float = 1e-4
    alpha: float = 1.6
    eq_rho_scale: float = 1e3
    ruiz_iters: int = 10
    refine_steps: int = 1
    # OSQP-style residual-balanced rho adaptation (OSQP §5.2): number of
    # mid-run adaptation events.  Each event splits the iteration budget,
    # rescales the free-row rho by sqrt(r_prim_rel / r_dual_rel) (clipped
    # to [1e-2, 1e3]) and re-factors.  A FIXED rho is state-dependently
    # wrong for the whole-body ID QP: at rho=10 the single-support
    # problems stall at r_dual ~0.4 (stance fz 6 N of the needed 394 —
    # the t=238 free-fall bug), while rho=1 stalls a different phase.
    # Default 0 (off) preserves the MPC solver paths bit-for-bit.
    rho_adapt: int = 0
    # kkt_form=True: LU-factored KKT system — condition-robust (required
    # for the whole-body ID QP in f32, whose normal equations reach cond
    # 1e11) but the triangular solves serialize poorly on the MXU.
    # kkt_form=False: one explicit inverse of the (Ruiz-scaled) normal
    # matrix P + sI + A' rho A; every iteration is a pure matmul — the
    # fast path for QPs whose scaled normal matrix stays f32-friendly
    # (the centroidal MPC QP: measured cond ~1e5 after scaling).
    kkt_form: bool = True
    # Primal-dual active-set (PDAS) refinement, batched: each round guesses
    # the active set from (x, y) with the semismooth-Newton rule
    # act_u = {y + c(Ax-u) > 0}, act_l = {y + c(Ax-l) < 0}, then re-solves
    # the KKT system with active rows enforced by a large-weight penalty
    # (a fixed-shape stand-in for the exact equality KKT solve —
    # active-set sizes differ per scenario, so the penalty keeps every
    # scenario on one dense factorization shape).  Converges in ~3 rounds
    # on the MPC QPs and can both add and release rows; the ADMM phase
    # supplies a sane (x, y).
    pdas_rounds: int = 3
    pdas_weight: float = 1e5
    pdas_c: float = 1.0
    pdas_eps: float = 1e-6


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


def _kkt_solve(K, lu_piv, rhs, refine_steps: int):
    """LU solve with fixed-count iterative refinement (f32 backstop)."""
    s = lu_solve(lu_piv, rhs)
    for _ in range(refine_steps):
        r = rhs - _mm(K, s)
        s = s + lu_solve(lu_piv, r)
    return s


def admm_solve(P, q, A, l, u, x0, y0, settings: ADMMSettings,
               ocp_perm=None) -> ADMMResult:
    """One QP solve. All inputs are per-scenario (vmap over a batch axis).

    x0: primal warm start; y0: dual warm start, both in *unscaled* space.
    ocp_perm: optional ops.blocktri.StagePerm — when given (and kkt_form
    is off) the linear solves use the block-tridiagonal stage structure
    instead of dense inverses (the OCP fast path; ~100x fewer factor
    flops at MPC sizes).
    """
    P0, q0, A0 = P, q, A
    P, q, A, l, u, D, E, c = _ruiz(P, q, A, l, u, settings.ruiz_iters)
    n, m = P.shape[0], A.shape[0]

    x = x0 / D
    y = c * y0 / E

    is_eq = (jnp.isfinite(l) & jnp.isfinite(u) & (jnp.abs(u - l) < 1e-9))
    sigma = settings.sigma
    alpha = settings.alpha

    zc = jnp.clip(_mm(A, x), l, u)

    def make_body(rho):
        """Factor the linear system for this rho and return the ADMM
        iteration body (branch-specific factorization)."""
        if settings.kkt_form:
            # KKT-form coefficient matrix (OSQP eq. 15)
            K = jnp.block([[P + sigma * jnp.eye(n), A.T],
                           [A, -jnp.diag(1.0 / rho)]])
            lu_piv = lu_factor(K)

            def body(_, carry):
                x, zc, y = carry
                rhs = jnp.concatenate([sigma * x - q, zc - y / rho])
                s = _kkt_solve(K, lu_piv, rhs, settings.refine_steps)
                xt, nu = s[:n], s[n:]
                zt_kkt = zc + (nu - y) / rho
                x_new = alpha * xt + (1 - alpha) * x
                zt = alpha * zt_kkt + (1 - alpha) * zc
                z_new = jnp.clip(zt + y / rho, l, u)
                y_new = y + rho * (zt - z_new)
                return (x_new, z_new, y_new)
        elif ocp_perm is not None:
            # block-tridiagonal OCP fast path: stage-structured factors
            from cmpc_tpu.ops import blocktri
            Dblk, Oblk = blocktri.build_blocks(P, A, rho, sigma, ocp_perm)
            fac = blocktri.factor(Dblk, Oblk)

            def body(_, carry):
                x, zc, y = carry
                rhs = sigma * x - q + _mm(A.T, rho * zc - y)
                xt = blocktri.solve(fac, rhs, ocp_perm)
                axt = _mm(A, xt)
                x_new = alpha * xt + (1 - alpha) * x
                zt = alpha * axt + (1 - alpha) * zc
                z_new = jnp.clip(zt + y / rho, l, u)
                y_new = y + rho * (zt - z_new)
                return (x_new, z_new, y_new)
        else:
            # normal-equations fast path: matmul-only iterations (MXU)
            Mn = P + sigma * jnp.eye(n) + _mm(A.T * rho, A)
            Minv = jnp.linalg.inv(Mn)

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
        return body

    n_stage = settings.rho_adapt + 1
    # distribute iterations over stages without dropping the remainder
    # (iters // n_stage alone silently lost up to n_stage-1 iterations
    # for non-divisible settings, ADVICE r4); the last stage gets the
    # extras so the final (best-rho) stage runs longest
    iters_per = max(settings.iters // n_stage, 1)
    rem = max(settings.iters - iters_per * n_stage, 0)
    rho_free = jnp.asarray(float(settings.rho), P.dtype)
    for stage in range(n_stage):
        n_it = iters_per + (rem if stage == n_stage - 1 else 0)
        rho = jnp.where(is_eq, rho_free * settings.eq_rho_scale, rho_free)
        x, zc, y = jax.lax.fori_loop(0, n_it, make_body(rho),
                                     (x, zc, y))
        if stage + 1 < n_stage:
            # residual-balanced update (OSQP §5.2).  NOTE: residuals are
            # measured in RUIZ-SCALED space (OSQP specifies unscaled);
            # the scaled-space balance is deliberate — the same Ruiz
            # equilibration is what makes the f32 solve viable, and
            # balancing in the solve's own metric is what the stall
            # diagnosis (sim/wholebody_loop.py id_settings note) was
            # measured with
            ax = _mm(A, x)
            eps = jnp.asarray(1e-12, P.dtype)
            rp = jnp.max(jnp.abs(ax - zc)) \
                / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(ax)),
                                          jnp.max(jnp.abs(zc))), eps)
            px = _mm(P, x)
            aty = _mm(A.T, y)
            rd = jnp.max(jnp.abs(px + q + aty)) \
                / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(px)),
                                          jnp.maximum(jnp.max(jnp.abs(aty)),
                                                      jnp.max(jnp.abs(q)))),
                              eps)
            rho_free = jnp.clip(
                rho_free * jnp.sqrt(rp / jnp.maximum(rd, eps)),
                1e-2, 1e3)

    # ---- PDAS refinement rounds (KKT form) ----
    fin_l = jnp.isfinite(l)
    fin_u = jnp.isfinite(u)
    w_act = settings.pdas_weight
    cpen = settings.pdas_c
    free = ~is_eq

    def _active_set(xp, yp):
        ax = _mm(A, xp)
        act_u = fin_u & free & (yp + cpen * (ax - u) > 0)
        act_l = fin_l & free & (yp + cpen * (ax - l) < 0)
        act = is_eq | act_u | act_l
        tgt = jnp.where(is_eq, jnp.where(fin_l, l, 0.0),
                        jnp.where(act_u, jnp.where(fin_u, u, 0.0),
                                  jnp.where(fin_l, l, 0.0)))
        return act, tgt

    if settings.kkt_form:
        def pdas_round(carry, _):
            xp, yp = carry
            act, tgt = _active_set(xp, yp)
            actf = act.astype(x.dtype)
            # active rows: near-equality (diag -1/w_act); inactive rows:
            # decoupled (masked A row, diag -1 => nu = 0)
            Aact = A * actf[:, None]
            diag = -(actf / w_act + (1.0 - actf))
            Kp = jnp.block([[P + settings.pdas_eps * jnp.eye(n), Aact.T],
                            [Aact, jnp.diag(diag)]])
            lup = lu_factor(Kp)
            rhs = jnp.concatenate([-q, actf * tgt])
            s = _kkt_solve(Kp, lup, rhs, settings.refine_steps)
            xp = s[:n]
            yp = s[n:] * actf
            return (xp, yp), None
    elif ocp_perm is not None:
        from cmpc_tpu.ops import blocktri

        def pdas_round(carry, _):
            xp, yp = carry
            act, tgt = _active_set(xp, yp)
            W = jnp.where(act, w_act, 0.0)
            Dp, Op = blocktri.build_blocks(P, A, W, settings.pdas_eps,
                                           ocp_perm)
            facp = blocktri.factor(Dp, Op)
            xp = blocktri.solve(facp, -q + _mm(A.T, W * tgt), ocp_perm)
            yp = W * (_mm(A, xp) - tgt)
            return (xp, yp), None
    else:
        def pdas_round(carry, _):
            xp, yp = carry
            act, tgt = _active_set(xp, yp)
            W = jnp.where(act, w_act, 0.0)
            Mp = P + 1e-7 * jnp.eye(n) + _mm(A.T * W, A)
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
