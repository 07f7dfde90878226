"""State elimination (condensing) of the centroidal MPC subproblem.

The SQP subproblem at base point (Xbar, Ubar) — with Xbar = rollout(x0,
Ubar), so the init/dynamics equality rows are exactly feasible — is
reduced to the input space:  dX = E dU  with E the block-lower-triangular
sensitivity of the Euler rollout (centroidal_mpc_vertices.py:185-190).
The result is a dense inequality-constrained QP in v = [dU (32N), s (N+1)]
where s are elastic slacks on the linearized Lyapunov (:217-220) and
angular-momentum (:222-224) rows: those rows can be jointly infeasible
with the trust region even when the NLP is feasible (the round-1 landing
deadlock), and IPOPT survives because its barrier subproblems are always
relaxed — the slack-with-exact-penalty rows are the SQP equivalent
(Gill et al., elastic mode).

All other constraint families (height, friction, unilaterality, stance
box, ocp/problem.constraints) condense to one-sided rows C v <= d.
Gamma-gated rows that vanish in swing phases (all-zero C rows with d = 0)
are neutralized with d = 1 so the interior-point slack stays positive.

Everything here is jittable and vmap-able; N is static so the E recursion
unrolls at trace time.
"""

from __future__ import annotations

from typing import NamedTuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.models import centroidal as cm
from cmpc_tpu.ocp import problem

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

# Exact-penalty weight on the Lyapunov/momentum slacks.  Must dominate the
# h_w cost tradeoff: at 1e4 the optimizer systematically preferred paying
# the slack penalty over producing the CoM-convergent forces the hard
# Lyapunov rows would have forced (IPOPT's rows are hard), and the
# closed-loop error grew without bound; 1e6 restores the reference's
# constraint pressure while still absorbing the genuinely infeasible
# landing-tick subproblems.
W_ELASTIC = 1e6

# Tightening margin on the soft (Lyapunov/momentum) rows; see the note at
# their assembly below.  Round-5 recalibration: 2e-3 (the r3 value) is
# enough to stabilize the loop through the dissipative centroidal plant,
# but NOT under exact execution of the solver's own node-1 predictions —
# an ideal-execution loop (plant := node-1, the regime the articulated
# whole-body stack empirically realizes to ~1e-4) diverges at 2e-3 and is
# bounded at 1e-2 (measured sweep: err windows 0.31 / 0.05 / diverging
# again at 3e-2 where the margin starts making landing subproblems
# infeasible).  1e-2 also improves the plant-based 500-tick walk (max err
# 0.030 -> 0.019).  The margin plays the role of IPOPT's interior bias
# (c = -mu/lambda < 0) in the reference, which at tol 1e-3 sits at a
# comparable depth inside the feasible set.
SOFT_MARGIN = 1e-2


class CondensedQP(NamedTuple):
    H: jnp.ndarray      # (nv, nv) PD Hessian over v = [dU, s]
    g: jnp.ndarray      # (nv,)
    C: jnp.ndarray      # (mc, nv) one-sided rows C v <= d
    d: jnp.ndarray      # (mc,)
    E: jnp.ndarray      # (20*(N+1), 32*N) state sensitivity dX = E dU
    row_scale: jnp.ndarray  # (mc,) applied row scaling (for dual un-scaling)
    # structured=True only: the friction-cone + unilaterality rows (40 per
    # stage, 400 of the 541 constraint rows at N=10) pulled OUT of C into
    # per-stage input-local blocks — stage i's rows touch only the 24
    # force coordinates of dU stage i, so their contribution to the IPM
    # Newton matrix C' D C is a block-diagonal scatter of (24, 24) blocks
    # instead of a share of the dense (mc, nv)^2 product (the dominant
    # matmul of the whole solve, ~3.6x larger with them included).
    C_blk: jnp.ndarray | None = None   # (N, 40, 24)
    d_blk: jnp.ndarray | None = None   # (N, 40)


def n_slack(cfg: WalkConfig) -> int:
    return cfg.N + 1          # N Lyapunov rows + 1 momentum row


def soft_row_parts(lam_soft, params: problem.MPCParams, cfg: WalkConfig,
                   psd: bool = True):
    """The pieces of :func:`soft_row_hessian` before the dense scatter:
    (idx, Q11, lam_mom) with idx (N, 11, 3) the z-coordinates each
    (row, axis) 11-block touches, Q11 (N, 11, 11) the lam-weighted
    per-axis blocks, and lam_mom the momentum-row multiplier (2*lam_mom
    on the hw_1 diagonal).  The condensing fast path contracts these
    directly against rows of [E; I] instead of scattering into a dense
    (540, 540) matrix (~300 MB of HBM traffic per materialization at
    batch 256)."""
    return _soft_row_impl(lam_soft, params, cfg, psd)


def soft_row_hessian(lam_soft, params: problem.MPCParams, cfg: WalkConfig,
                     psd: bool = True):
    """Convexified exact Hessian of lam' c_soft(z) over z = [vec(X), vec(U)].

    The Lyapunov rows (centroidal_mpc_vertices.py:217-220) are exactly
    quadratic; expanding c_i = -k1|z1|^2 + k1|z2|^2 + (1-k1^2) z1'z2
    + z2'V + z2'theta_i/m + linear gives, per axis, the Hessian over
    basis (p_{i+1}, v_{i+1}, V_i, theta_i):

        Q = [[0,        k1^2+1,  k1,   k1/m],
             [k1^2+1,   2 k1,    1,    1/m ],
             [k1,       1,       0,    0   ],
             [k1/m,     1/m,     0,    0   ]]

    with V_i = (Gamma_l sum f_l + Gamma_r sum f_r)/m spreading the V
    coordinate over the 8 vertex forces with coefficient Gamma/m.  The
    momentum row (:222-224) contributes 2I on hw_1 (its -2I on hw_0 is
    constant in the subproblem since dx_0 = 0).

    A Gauss-Newton SQP that omits this curvature underestimates the
    post-step Lyapunov violation ~40x at walking-speed steps (measured:
    predicted 0.38 vs actual 16.5 at alpha=1) and the merit line search
    then rejects every step — the round-1 landing deadlock in its true
    form.  This is the SQP analogue of IPOPT's exact Lagrangian Hessian.

    Convexification (convex-concave): Q is indefinite, so only its PSD
    part Q+ = V max(w, 0) V' (a 4x4 eigh — trivially cheap, unlike an
    eigenvalue clamp of the condensed 331-dim Hessian, which blew up both
    compile and solve time) enters the subproblem; the concave part stays
    first-order in the constraint linearization.  PSD-ness survives the
    linear substitution into z-space, so the full subproblem Hessian
    remains PD without any large eigendecomposition.
    """
    idx, Q11, lam_mom = _soft_row_impl(lam_soft, params, cfg, psd)
    nz = cfg.n_z
    H = jnp.zeros((nz, nz), lam_soft.dtype)
    for k in range(3):
        ik = idx[:, :, k]                                  # (N,11)
        H = H.at[ik[:, :, None], ik[:, None, :]].add(Q11)
    hw1 = 26 + np.arange(3)
    H = H.at[hw1, hw1].add(2.0 * lam_mom)
    return H


def _soft_row_impl(lam_soft, params: problem.MPCParams, cfg: WalkConfig,
                   psd: bool = True):
    N = cfg.N
    nX = 20 * (N + 1)
    nz = cfg.n_z
    k1, m = params.k1, params.mass
    lam = lam_soft[:N]
    lam_mom = lam_soft[N]
    dt = lam_soft.dtype

    z4 = jnp.zeros((), dt)
    Q = jnp.array(
        [[0.0 * k1, k1 ** 2 + 1.0, k1, k1 / m],
         [k1 ** 2 + 1.0, 2.0 * k1, 1.0 + z4, 1.0 / m],
         [k1, 1.0 + z4, z4, z4],
         [k1 / m, 1.0 / m, z4, z4]])
    if psd:
        ew, EV = jnp.linalg.eigh(Q)
        Qp = (EV * jnp.maximum(ew, 0.0)) @ EV.T            # PSD part
    else:
        # exact (indefinite) Hessian — used by tests to check the hand
        # derivation against jax.hessian(lam @ c_soft)
        Qp = Q

    # compact 11-coordinate basis per (row, axis): [p, v, theta, f_1..f_8]
    # T maps it to (p, v, V, theta); only V mixes (gamma/m on the forces).
    gam8 = jnp.concatenate(
        [jnp.repeat(params.gamma_l[:N, None], 4, 1),
         jnp.repeat(params.gamma_r[:N, None], 4, 1)], axis=1) / m  # (N,8)
    T = jnp.zeros((N, 4, 11), dt)
    T = T.at[:, 0, 0].set(1.0)
    T = T.at[:, 1, 1].set(1.0)
    T = T.at[:, 3, 2].set(1.0)
    T = T.at[:, 2, 3:].set(gam8)
    Q11 = jnp.einsum("nai,ab,nbj->nij", T, Qp, T) \
        * lam[:, None, None]                               # (N,11,11)

    i_ = np.arange(N)
    ax = np.arange(3)
    vtx = 3 * np.arange(8)
    f_cols = (nX + 32 * i_)[:, None, None] + vtx[None, :, None] \
        + ax[None, None, :]                                # (N,8,3)
    idx = np.concatenate([
        (20 * (i_ + 1))[:, None, None] + ax[None, None, :],      # p
        (20 * (i_ + 1) + 3)[:, None, None] + ax[None, None, :],  # v
        (20 * i_ + 9)[:, None, None] + ax[None, None, :],        # theta
        f_cols,
    ], axis=1)                                             # (N,11,3)
    return idx, Q11, lam_mom


def build(z, params: problem.MPCParams, cfg: WalkConfig,
          prox: jnp.ndarray | float, w_prox_u: jnp.ndarray,
          lam_soft: jnp.ndarray | None = None,
          soft: bool = True, structured: bool = False) -> CondensedQP:
    """Condense the QP at base point z = [vec(Xbar), vec(Ubar)].

    prox * diag(w_prox_u) is a proximal (Levenberg) term on dU only — the
    states are a function of the inputs, so damping the inputs bounds the
    whole step.

    lam_soft (ns,): multiplier estimates for the Lyapunov/momentum rows;
    their exact constraint Hessian (soft_row_hessian) is added to the
    subproblem Hessian and the result convexified by an eigenvalue clamp.
    """
    N = cfg.N
    nX = 20 * (N + 1)
    nU = 32 * N
    ns = n_slack(cfg) if soft else 0
    nv = nU + ns
    n_eq = 20 * (N + 1)

    l_all, u_all = problem.constraint_bounds(cfg)
    l_all, u_all = jnp.asarray(l_all, z.dtype), jnp.asarray(u_all, z.dtype)

    if structured:
        # per-block linearization: the dense (m, n_z) J is never
        # materialized (its batched scatter traffic dominated the
        # 9-17 ms linearize + the J_in gathers below)
        parts = problem.linearize_parts(z, params, cfg)
        c = parts.c
        A_blk, B_blk = parts.A_blk, parts.B_blk
        J = None
    else:
        c, J = problem.linearize(z, params, cfg)
        # ---- sensitivity E: dx_{i+1} = A_i dx_i + B_i du_i, dx_0 = 0.
        # linearize() wrote the dynamics rows as [+I at x_{i+1}] - A_i -
        # B_i, so A_i and B_i are recovered from J with a sign flip.
        rows = 20 + 20 * jnp.arange(N)[:, None, None] \
            + jnp.arange(20)[None, :, None]
        cols_x = (20 * jnp.arange(N))[:, None, None] \
            + jnp.arange(20)[None, None]
        cols_u = (nX + 32 * jnp.arange(N))[:, None, None] \
            + jnp.arange(32)[None, None]
        A_blk = -J[rows, jnp.broadcast_to(cols_x, (N, 20, 20))]  # (N,20,20)
        B_blk = -J[rows, jnp.broadcast_to(cols_u, (N, 20, 32))]  # (N,20,32)

    E_rows = [jnp.zeros((20, nU), z.dtype)]
    for i in range(N):
        Ei = _mm(A_blk[i], E_rows[i])
        Ei = Ei.at[:, 32 * i:32 * (i + 1)].add(B_blk[i])
        E_rows.append(Ei)
    E = jnp.concatenate(E_rows, axis=0)                       # (nX, nU)

    # ---- condensed cost: 1/2 dz' P dz + (P z + q)' dz over dz = S dU,
    # S = [[E], [I]];  plus the proximal term and the linear slack penalty.
    if structured:
        # block form: P = blockdiag(diag(dX_diag), Puu) and the soft-row
        # Hessian contracted against gathered rows of S — no dense
        # (540, 540) matrix is ever materialized (its scatter/slice
        # traffic at batch 256 dominated this function's 23 ms).
        dX_diag, Puu_c, q = problem.cost_quadratic_parts(params, cfg)
        gz_X = dX_diag * z[:nX] + q[:nX]
        gz_U = _mm(Puu_c, z[nX:]) + q[nX:]
        Hc = _mm(E.T, dX_diag[:, None] * E) + Puu_c
        if lam_soft is not None:
            idx, Q11, lam_mom = soft_row_parts(lam_soft, params, cfg)
            SE = jnp.concatenate([E, jnp.eye(nU, dtype=z.dtype)], axis=0)
            R = SE[idx.reshape(-1)].reshape(N, 11, 3, nU)
            Y = jnp.einsum("nij,njkb->nikb", Q11, R,
                           precision=jax.lax.Precision.HIGHEST)
            Hc = Hc + jnp.einsum("nika,nikb->ab", R, Y,
                                 precision=jax.lax.Precision.HIGHEST)
            E_hw1 = E[26:29]                                  # (3, nU)
            Hc = Hc + 2.0 * lam_mom * _mm(E_hw1.T, E_hw1)
        Hc = Hc + prox * jnp.diag(w_prox_u)
        gc = _mm(E.T, gz_X) + gz_U
    else:
        P, q = problem.cost_quadratic(params, cfg)
        gz = _mm(P, z) + q
        PH = P if lam_soft is None else P + soft_row_hessian(
            lam_soft, params, cfg)
        Pxx, Pxu = PH[:nX, :nX], PH[:nX, nX:]
        Puu = PH[nX:, nX:]
        PE = _mm(Pxx, E)                                      # (nX, nU)
        Hc = _mm(E.T, PE) + _mm(E.T, Pxu) + _mm(Pxu.T, E) + Puu
        Hc = Hc + prox * jnp.diag(w_prox_u)
        gc = _mm(E.T, gz[:nX]) + gz[nX:]

    H = jnp.zeros((nv, nv), z.dtype)
    H = H.at[:nU, :nU].set(Hc)
    # quadratic slack regularization: the slacks otherwise have zero
    # curvature and the interior-point Newton matrix is near-singular in
    # those coordinates (observed: Newton directions walking the merit
    # uphill by 1e6).  At the solution s ~ 0 so the extra term is inert.
    H = H.at[jnp.arange(nU, nv), jnp.arange(nU, nv)].add(1.0)
    g = jnp.concatenate([gc, jnp.full(ns, W_ELASTIC, z.dtype)])

    # ---- inequality rows, condensed: J_in dz = (J_x E + J_u) dU = G dU
    # row layout of the ineq block (problem.constraints docstring):
    # [lyap(N), mom(1), height(N), fric(32N), fz(8N), box(6N)]
    if structured:
        # fric/fz rows have ZERO state dependence (they read only the
        # stage forces), so they never enter the J_x E product; pull them
        # out as per-stage (40, 24) blocks built in closed form from the
        # contact gates and keep only [lyap, mom, height, box] dense —
        # each of which is a contraction of the per-block linearization
        # against rows of E (no dense J, no (m_in, nX) @ (nX, nU) matmul
        # over rows that were structurally zero).
        f0_rel = 2 * N + 1
        b0_rel = f0_rel + 40 * N
        sel = np.concatenate([np.arange(f0_rel),
                              b0_rel + np.arange(6 * N)])
        c_in = c[n_eq:][sel]
        lo = l_all[n_eq:][sel]
        hi = u_all[n_eq:][sel]
        Er = E.reshape(N + 1, 20, nU)
        # lyap rows: gx_i @ E_i + gxn_i @ E_{i+1} + gu_i at stage cols
        G_ly = jnp.einsum("nk,nkj->nj", parts.gx, Er[:N],
                          precision=jax.lax.Precision.HIGHEST) \
            + jnp.einsum("nk,nkj->nj", parts.gxn, Er[1:],
                         precision=jax.lax.Precision.HIGHEST)
        ucols = (32 * np.arange(N))[:, None] + np.arange(32)[None]
        G_ly = G_ly.at[np.arange(N)[:, None], ucols].add(parts.gu)
        # momentum row: 2*hw1 at x_1 hw coords (x_0 rows of E are zero)
        G_mom = (parts.hw1 @ E[26:29])[None]
        # height rows: E row of CoM z at node i, i = 0..N-1
        G_h = E[20 * np.arange(N) + 2]
        # stance box rows: gamma-gated foot-position rows of E at node i+1
        rows_bl = (20 * (np.arange(N) + 1))[:, None] + 13 + np.arange(3)
        G_bl = E[rows_bl.reshape(-1)] \
            * jnp.repeat(params.gamma_l[1:], 3)[:, None]
        G_br = E[(rows_bl + 4).reshape(-1)] \
            * jnp.repeat(params.gamma_r[1:], 3)[:, None]
        G = jnp.concatenate([G_ly, G_mom, G_h, G_bl, G_br], axis=0)
        # blocks: rows [fric_l(16), fric_r(16), fz_l(4), fz_r(4)] on the
        # 24 stage force coords; values per problem.linearize
        Amu = jnp.asarray(problem._friction_matrix(cfg.mu), z.dtype)
        blkA = jnp.zeros((16, 12), z.dtype)
        v_i = np.repeat(np.arange(4), 4)          # vertex of each row
        k_i = np.tile(np.arange(4), 4)            # cone row of each row
        blkA = blkA.at[np.arange(16)[:, None],
                       (3 * v_i)[:, None] + np.arange(3)[None]].set(
            Amu[k_i])
        blkZ = jnp.zeros((4, 12), z.dtype)
        blkZ = blkZ.at[np.arange(4), 3 * np.arange(4) + 2].set(-1.0)
        z12 = jnp.zeros((16, 12), z.dtype)
        z4 = jnp.zeros((4, 12), z.dtype)
        W1 = jnp.concatenate([
            jnp.concatenate([blkA, z12], axis=1),
            jnp.concatenate([z12, blkA], axis=1),
            jnp.concatenate([blkZ, z4], axis=1),
            jnp.concatenate([z4, blkZ], axis=1)], axis=0)    # (40, 24)
        gate = jnp.concatenate([
            jnp.repeat(params.gamma_l[:N, None], 16, 1),
            jnp.repeat(params.gamma_r[:N, None], 16, 1),
            jnp.repeat(params.gamma_l[:N, None], 4, 1),
            jnp.repeat(params.gamma_r[:N, None], 4, 1)], axis=1)  # (N,40)
        W = W1[None] * gate[:, :, None]                      # (N, 40, 24)
        cf = c[n_eq + f0_rel:n_eq + b0_rel]
        c_blk = jnp.concatenate([
            cf[:16 * N].reshape(N, 16),
            cf[16 * N:32 * N].reshape(N, 16),
            cf[32 * N:36 * N].reshape(N, 4),
            cf[36 * N:].reshape(N, 4)], axis=1)              # (N, 40)
        d_blk = -c_blk                                       # hi == 0 rows
        # same row hygiene as the dense rows (equilibrate, neutralize
        # vacated rows, cap huge slack margins)
        rn_b = jnp.max(jnp.abs(W), axis=2)
        vac_b = rn_b < 1e-9
        sc_b = jnp.where(vac_b, 1.0, 1.0 / jnp.clip(rn_b, 1e-2, None))
        W = W * sc_b[:, :, None]
        d_blk = jnp.where(vac_b, 1.0, d_blk * sc_b)
        fac_b = jnp.minimum(1.0, 10.0 / jnp.maximum(jnp.abs(d_blk), 1e-12))
        W = W * fac_b[:, :, None]
        d_blk = d_blk * fac_b
    else:
        J_in = J[n_eq:]
        c_in = c[n_eq:]
        lo = l_all[n_eq:]
        hi = u_all[n_eq:]
        W = d_blk = None
        G = _mm(J_in[:, :nX], E) + J_in[:, nX:]               # (m_in, nU)

    # row layout of the ineq block (problem.constraints docstring):
    # [lyap(N), mom(1), height(N), fric(32N), fz(8N), box(6N)]
    # The Lyapunov rows get the tightening margin whether or not they
    # carry slacks.  The momentum row must NOT be margined: it reads
    # |hw_1|^2 <= |hw_0|^2, and |hw_0|^2 is ~0 for most of the walk —
    # a margin makes the row infeasible (|hw_1|^2 >= 0 > |hw_0|^2 - m),
    # every subproblem then carries a blown-up dual on it, and the
    # carried lam_soft Hessian correction is polluted from tick 0.
    hi = hi.at[:N].add(-SOFT_MARGIN)
    n_soft = ns                      # first ns rows get slacks
    n_box = 6 * N
    n_hard = G.shape[0] - n_soft - n_box

    C_rows = []
    d_rows = []
    # soft rows: G du - s <= hi - c - margin.  The tightening margin is
    # load-bearing: an elastic row that is merely TIGHT sits at c = s > 0
    # — systematically on the expansive side of the Lyapunov-decrease
    # boundary — and the closed loop then diverges at exactly the LIP rate
    # e^{sqrt(g/h) t} (measured: tracking error doubling every ~19 ticks,
    # solver residual p50 ~1e-3, in f32 and f64 alike, real and ideal
    # plant alike).  IPOPT's interior iterates sit strictly INSIDE
    # (c = -mu/lambda < 0), which is where the reference's contraction
    # comes from; the margin restores that bias while the slack still
    # absorbs genuinely infeasible landing-tick subproblems.
    if soft:
        S_soft = -jnp.eye(ns, dtype=z.dtype)
        C_rows.append(jnp.concatenate([G[:n_soft], S_soft], axis=1))
        d_rows.append(hi[:n_soft] - c_in[:n_soft])
    # hard one-sided rows
    zpad = jnp.zeros((n_hard, ns), z.dtype)
    C_rows.append(jnp.concatenate([G[n_soft:n_soft + n_hard], zpad], axis=1))
    d_rows.append(hi[n_soft:n_soft + n_hard]
                  - c_in[n_soft:n_soft + n_hard])
    # box rows, both sides
    Gb = G[n_soft + n_hard:]
    cb = c_in[n_soft + n_hard:]
    zb = jnp.zeros((n_box, ns), z.dtype)
    C_rows.append(jnp.concatenate([Gb, zb], axis=1))
    d_rows.append(hi[n_soft + n_hard:] - cb)
    C_rows.append(jnp.concatenate([-Gb, zb], axis=1))
    d_rows.append(cb - lo[n_soft + n_hard:])
    # slack nonnegativity: -s <= 0
    C_rows.append(jnp.concatenate(
        [jnp.zeros((ns, nU), z.dtype), -jnp.eye(ns, dtype=z.dtype)],
        axis=1))
    d_rows.append(jnp.zeros(ns, z.dtype))

    C = jnp.concatenate(C_rows, axis=0)
    d = jnp.concatenate(d_rows)

    # ---- row hygiene: equilibrate scales, neutralize vanished rows.
    # The row-norm FLOOR matters: nearly uncontrollable rows (the CoM
    # height constraint at node 1 has sensitivity ~ delta^2/m ~ 2.5e-6 to
    # the inputs) must not be amplified 1e6x — that inflated d to ~1.6e4
    # and destabilized the interior-point endgame.  Rows with a huge slack
    # margin are additionally rescaled so d <= D_CAP, bounding the initial
    # complementarity without changing the constraint set.
    rn = jnp.max(jnp.abs(C), axis=1)
    vac = rn < 1e-9
    scale = jnp.where(vac, 1.0, 1.0 / jnp.clip(rn, 1e-2, None))
    C = C * scale[:, None]
    d = jnp.where(vac, 1.0, d * scale)
    D_CAP = 10.0
    fac = jnp.minimum(1.0, D_CAP / jnp.maximum(jnp.abs(d), 1e-12))
    C = C * fac[:, None]
    d = d * fac
    return CondensedQP(H=H, g=g, C=C, d=d, E=E, row_scale=scale * fac,
                       C_blk=W, d_blk=d_blk)
