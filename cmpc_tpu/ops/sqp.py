"""SQP (real-time-iteration) wrapper around the ADMM QP kernel.

Replaces the per-tick IPOPT solve of the reference
(centroidal_mpc_vertices.py:605-611).  The MPC cost is exactly quadratic
(ocp/problem.cost_quadratic); only the dynamics, Lyapunov and momentum
constraints are nonlinear, so each SQP iteration linearizes the stacked
constraint vector with jacfwd and solves one convex QP.  A fixed number of
iterations (cfg.sqp_iters) with primal/dual warm starting across control
ticks — the same warm-start strategy as the reference (:630-631) — keeps
every scenario in lockstep for batching.

There is no feasibility-failure crash path (the reference prints
infeasibilities and dies, :605-611): the ADMM result is always defined, and
per-scenario residuals are returned so callers can mask diverged scenarios
(SURVEY.md §5 failure-detection upgrade).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.ocp import problem
from cmpc_tpu.ops.admm import ADMMSettings, admm_solve


class SolverState(NamedTuple):
    """Warm-start state carried across control ticks."""

    z: jnp.ndarray   # (n_z,) primal iterate
    y: jnp.ndarray   # (m,) dual iterate


class SolveInfo(NamedTuple):
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    cost: jnp.ndarray
    lyap_violation: jnp.ndarray  # max positive Lyapunov constraint value


def init_solver_state(cfg: WalkConfig, x0=None, mass=None) -> SolverState:
    """Cold-start iterate: constant state trajectory at x0 and hover forces
    (mg/8 per contact vertex).  A physically plausible linearization point —
    SQP with full steps oscillates when started from all-zeros because the
    bilinear momentum dynamics linearize degenerately there."""
    z = jnp.zeros(cfg.n_z)
    if x0 is not None:
        X = jnp.tile(x0, (cfg.N + 1, 1))
        z = z.at[: (cfg.N + 1) * 20].set(X.reshape(-1))
    nX = 20 * (cfg.N + 1)
    fz = (jnp.asarray(40.0) if mass is None else jnp.asarray(mass)) \
        * cfg.g / 8.0
    U = jnp.zeros((cfg.N, 32))
    U = U.at[:, 2:24:3].set(fz)
    z = z.at[nX:].set(U.reshape(-1))
    # y derives its device-varying type from z (shard_map vma check: the
    # closed-loop scan carries y, and the body's output y varies per shard)
    y = jnp.zeros(problem.num_constraints(cfg)) + 0.0 * z[0]
    return SolverState(z=z, y=y)


def _rollout_X(x0, U, params: problem.MPCParams, cfg: WalkConfig):
    """Integrate the dynamics from x0 under U — produces a state trajectory
    with exactly zero dynamics residual (the RTI 'rollout' re-basing)."""
    from cmpc_tpu.models import centroidal as cm
    polygon = cm.foot_polygon(cfg.foot_length, cfg.foot_width)

    def step(x, inp):
        r, gl, gr, u = inp
        xn = cm.euler_step(x, r, gl, gr, u, params.k1, params.k2,
                           params.mass, cfg.g, polygon, cfg.delta)
        return xn, xn

    _, X_tail = jax.lax.scan(
        step, x0, (params.com_ref, params.gamma_l[:cfg.N],
                   params.gamma_r[:cfg.N], U))
    return jnp.concatenate([x0[None], X_tail], axis=0)


def prep_warmstart(state: SolverState, params: problem.MPCParams,
                   cfg: WalkConfig) -> jnp.ndarray:
    """Gait-consistent warm-start inputs U from the carried iterate.

    Shared by both solver paths (ADMM and condensed-IPM).  See the inline
    notes — each repair exists because a specific closed-loop failure was
    traced to the naive carried warm start."""
    # Re-base the warm start: keep the carried U, integrate X from the new
    # x0 so the dynamics rows start exactly feasible.  Without this the
    # bilinear momentum rows leave an O(1) residual that full SQP steps
    # cannot remove (the L1 merit then rejects every step).
    #
    # Gait-consistency repair: at support switches the carried forces sit
    # on feet the new Gamma gates zero out, so the naive rollout is a
    # falling trajectory — a linearization point the proximal SQP cannot
    # escape in few iterations (observed: the first single-support tick's
    # QP left 0.08 residuals on init/dyn/lyap rows and the walk fell one
    # step later).  Gate the carried vertex forces by the new contact
    # schedule and rescale the surviving ones to keep supporting m*g.
    _, U_ws = problem.split_z(state.z, cfg)
    gl_u = params.gamma_l[:cfg.N, None, None]
    gr_u = params.gamma_r[:cfg.N, None, None]
    fl_ws = U_ws[:, 0:12].reshape(cfg.N, 4, 3) * gl_u
    fr_ws = U_ws[:, 12:24].reshape(cfg.N, 4, 3) * gr_u
    # top up vertical support on the *active* vertices so every stage of
    # the rollout carries ~m*g (appearing contacts — a landing foot inside
    # the horizon — enter with zero carried force, which left a falling
    # tail trajectory and the same deadlock one step later at t=262).
    fz_tot = fl_ws[..., 2].sum(-1) + fr_ws[..., 2].sum(-1)       # (N,)
    n_act = 4.0 * (params.gamma_l[:cfg.N] + params.gamma_r[:cfg.N])
    deficit = jnp.maximum(params.mass * cfg.g - fz_tot, 0.0) \
        / jnp.maximum(n_act, 1.0)                                 # (N,)
    fl_ws = fl_ws.at[..., 2].add(deficit[:, None] * gl_u[..., 0])
    fr_ws = fr_ws.at[..., 2].add(deficit[:, None] * gr_u[..., 0])
    U_ws = U_ws.at[:, 0:12].set(fl_ws.reshape(cfg.N, 12))
    U_ws = U_ws.at[:, 12:24].set(fr_ws.reshape(cfg.N, 12))

    # Swing-foot transfer seeding: near the end of single support the
    # measured-state packing pins the swing foot at its TAKE-OFF position
    # (the reference's plan-lag override) while the landing nodes inside
    # the horizon demand it within the +-1 cm stance box of the landing
    # reference — the exact NLP resolves this with a one-node foot
    # "teleport" (tens of m/s on the unbounded foot-velocity inputs, which
    # IPOPT performs without blinking) that a proximally damped SQP step
    # cannot reach from a ~0-velocity warm start (observed: every config
    # family fails at the first landing, t=263-270).  Seed the carried
    # foot-velocity inputs to execute that transfer exactly, so the
    # teleport is already in the linearization point.
    delta = cfg.delta
    idx_n = jnp.arange(cfg.N)

    def transfer_vel(gamma, x0_pos, pos_ref):
        land = jnp.argmax(gamma[1:] > 0.5)          # first stance node - 1
        k = land + 1                                 # steps before landing
        has = (gamma[0] < 0.5) & jnp.any(gamma[1:] > 0.5)
        target = pos_ref[land]
        v = (target - x0_pos) / (delta * k)
        mask = (idx_n < k) & has
        return jnp.where(mask[:, None], v[None, :], 0.0), has

    from cmpc_tpu.models import centroidal as cmod
    v_l, has_l = transfer_vel(params.gamma_l, params.x0[cmod.POS_L],
                              params.pos_ref_l)
    v_r, has_r = transfer_vel(params.gamma_r, params.x0[cmod.POS_R],
                              params.pos_ref_r)
    U_ws = U_ws.at[:, 24:27].set(
        jnp.where(has_l, v_l, U_ws[:, 24:27]))
    U_ws = U_ws.at[:, 27:30].set(
        jnp.where(has_r, v_r, U_ws[:, 27:30]))
    return U_ws


def solve_mpc(state: SolverState, params: problem.MPCParams,
              cfg: WalkConfig):
    """One MPC solve. Dispatches on cfg.mpc_solver:

    * "condip" — condensed single-shooting SQP with a dense Mehrotra
      interior-point inner QP (ocp/condense.py + ops/pdip.py); the
      high-accuracy production path.
    * "admm"   — sparse SQP over [X, U] with the OSQP-style ADMM + PDAS
      inner QP (ops/admm.py); kept as the structured fallback.
    """
    if cfg.mpc_solver == "condip":
        return _solve_mpc_condip(state, params, cfg)
    return _solve_mpc_admm(state, params, cfg)


def _solve_mpc_condip(state: SolverState, params: problem.MPCParams,
                      cfg: WalkConfig):
    """Condensed SQP: states are always the exact rollout of the inputs
    (init/dynamics rows exactly feasible by construction), each iteration
    solves the condensed inequality QP to high accuracy with the
    interior-point kernel, then a merit line search over the *nonlinear*
    rollout picks the step (alpha = 0 always a candidate — failure
    containment, SURVEY.md §5)."""
    from cmpc_tpu.ocp import condense
    from cmpc_tpu.ops.pdip import PDIPSettings, pdip_solve

    N = cfg.N
    nU = 32 * N
    l_c, u_c = problem.constraint_bounds(cfg)
    l_c, u_c = jnp.asarray(l_c), jnp.asarray(u_c)
    n_eq = 20 * (N + 1)

    # proximal weights over dU: foot-velocity / yaw-rate inputs exempt
    # (the landing transfer needs large foot velocities in one node)
    w_prox_u = jnp.ones(nU).reshape(N, 32).at[:, 24:].set(1e-3).reshape(-1)
    settings = PDIPSettings(iters=cfg.pdip_iters, refine=cfg.pdip_refine)

    U = prep_warmstart(state, params, cfg)

    def merit_of(Xc, Uc):
        zc = problem.join_z(Xc, Uc)
        c = problem.constraints(zc, params, cfg)[n_eq:]
        viol = jnp.sum(jnp.maximum(c - u_c[n_eq:], 0.0)
                       + jnp.maximum(l_c[n_eq:] - c, 0.0))
        return problem.cost_value(zc, params, cfg) \
            + condense.W_ELASTIC * viol

    # Lyapunov/momentum multiplier estimates, carried across ticks in the
    # matching rows of SolverState.y — they weight the exact constraint
    # Hessian in the subproblem (condense.soft_row_hessian).  The 1e4 cap
    # is curvature hygiene: a non-converged QP can report huge duals, and
    # feeding them back into the Hessian distorts the next subproblem
    # (observed: carried lam ~5e5 -> |dF| ~ 4,700 N garbage steps).
    ns = condense.n_slack(cfg)
    LAM_CAP = 1e4
    lam_soft = jnp.clip(state.y[n_eq:n_eq + ns], 0.0, LAM_CAP)

    X = _rollout_X(params.x0, U, params, cfg)
    # Adaptive proximal damping (Levenberg trust region): a rejected step
    # (best alpha == 0) means the quadratic model lied — the constraint
    # curvature (lyap/momentum rows are exactly quadratic) made the true
    # merit worse at every alpha.  Without adaptation the next subproblem
    # reproposes the SAME rejected step and the SQP stalls at a violated
    # point (observed at mid-single-support ticks: identical |dF| = 34 N
    # proposals rejected forever while the closed loop diverged at the LIP
    # rate).  Growing prox shrinks the step until the linear violation
    # reduction dominates the quadratic error — merit descent is then
    # guaranteed, the stall breaks.
    alphas = (1.0, 0.5, 0.25, 0.1, 0.0)

    def sqp_iter(carry, _):
        X, U, lam_soft, prox, _ = carry
        z = problem.join_z(X, U)
        qp = condense.build(z, params, cfg, prox, w_prox_u,
                            lam_soft=lam_soft, soft=cfg.condip_soft,
                            structured=True)
        res = pdip_solve(qp.H, qp.g, qp.C, qp.d, settings,
                         C_blk=qp.C_blk, d_blk=qp.d_blk)
        dU = jnp.nan_to_num(res.v[:nU], nan=0.0, posinf=0.0,
                            neginf=0.0).reshape(N, 32)
        lam_new = jnp.nan_to_num(res.lam[:ns] * qp.row_scale[:ns])
        lam_soft = jnp.clip(lam_new, 0.0, LAM_CAP)

        U_cands = jnp.stack([U + a * dU for a in alphas])
        X_cands = jax.vmap(
            lambda Uc: _rollout_X(params.x0, Uc, params, cfg))(U_cands)
        merits = jax.vmap(merit_of)(X_cands, U_cands)
        best = jnp.argmin(jnp.nan_to_num(merits, nan=jnp.inf))
        U = U_cands[best]
        X = X_cands[best]
        rejected = best == len(alphas) - 1
        small = best <= 1           # alpha >= 0.5 accepted
        prox = jnp.where(rejected, prox * 16.0,
                         jnp.where(small,
                                   jnp.maximum(prox / 4.0,
                                               cfg.condip_prox), prox))
        return (X, U, lam_soft, prox, res.r_dual), None

    # lax.scan over SQP iterations (one body in the jaxpr instead of
    # sqp_iters copies — the closed-loop scan was untraceable in
    # reasonable time with the round-2 unroll, VERDICT r2 weak #5).
    # prox/r_dual seeds derive from params.mass so their device-varying
    # type matches the body outputs under shard_map's vma check.
    one = jnp.ones_like(params.mass)
    carry0 = (X, U, lam_soft, cfg.condip_prox * one, 0.0 * one)
    (X, U, lam_soft, _, r_dual), _ = jax.lax.scan(
        sqp_iter, carry0, None, length=cfg.sqp_iters)

    z = problem.join_z(X, U)
    c_final = problem.constraints(z, params, cfg)
    viol_all = jnp.maximum(c_final - u_c, 0.0) \
        + jnp.maximum(l_c - c_final, 0.0)
    lyap = c_final[n_eq:n_eq + N]
    info = SolveInfo(
        r_prim=jnp.max(viol_all), r_dual=r_dual,
        cost=problem.cost_value(z, params, cfg),
        lyap_violation=jnp.max(jnp.maximum(lyap, 0.0)),
    )
    y = state.y.at[n_eq:n_eq + ns].set(lam_soft)
    return SolverState(z=z, y=y), info


def _solve_mpc_admm(state: SolverState, params: problem.MPCParams,
                    cfg: WalkConfig):
    """SQP over the full [X, U] stack with the ADMM + PDAS inner QP."""
    l_c, u_c = problem.constraint_bounds(cfg)
    l_c, u_c = jnp.asarray(l_c), jnp.asarray(u_c)
    P, q = problem.cost_quadratic(params, cfg)
    settings = ADMMSettings(iters=cfg.admm_iters, rho=cfg.admm_rho,
                            sigma=cfg.admm_sigma, alpha=cfg.admm_alpha,
                            kkt_form=cfg.admm_kkt_form)

    U_ws = prep_warmstart(state, params, cfg)
    X_ws = _rollout_X(params.x0, U_ws, params, cfg)
    z = problem.join_z(X_ws, U_ws)
    y = state.y
    con = lambda zz: problem.constraints(zz, params, cfg)

    def merit(zz):
        """L1 exact-penalty merit on the *nonlinear* constraints.  Full-step
        SQP oscillates on this problem (bilinear momentum dynamics +
        indefinite Lyapunov rows); a 3-point backtracking pick is enough to
        globalize it and stays branch-free for batching."""
        c = con(zz)
        viol = jnp.sum(jnp.maximum(c - u_c, 0.0)
                       + jnp.maximum(l_c - c, 0.0))
        return problem.cost_value(zz, params, cfg) + 1e4 * viol

    # --- elastic (slack-relaxed) subproblem structure -------------------
    # The linearized Lyapunov rows can be INFEASIBLE jointly with the
    # proximal trust region even when the nonlinear problem is feasible
    # (observed in closed loop entering single support: every other row
    # family exactly feasible, lyap violated ~0.04, the merit then rejects
    # every step and the controller deadlocks).  IPOPT survives this
    # because its interior-point subproblems are always relaxed; the SQP
    # equivalent is elastic mode (Gill et al.): lyap_i - s_i <= 0 with
    # s_i >= 0 and an exact linear penalty on s, solved in the same QP.
    N = cfg.N
    n_eq = 20 * (N + 1)
    n_z, n_e = cfg.n_z, cfg.n_z + N
    m0 = problem.num_constraints(cfg)
    W_ELASTIC = 1e4
    # stage-structured linear solves (elastic mode changes the variable
    # layout, so it stays on the dense path)
    ocp_perm = None
    if cfg.mpc_blocktri and not cfg.sqp_elastic and not cfg.admm_kkt_form:
        from cmpc_tpu.ops import blocktri
        ocp_perm = blocktri.stage_perm(cfg.N)

    # proximal weights: foot-velocity / yaw-rate inputs are exempt
    # (weight 1e-3) — the landing transfer needs tens of m/s on those
    # inputs in one node (see the warm-start seeding note below), and a
    # uniform prox term makes that step cost lam*|dv|^2, vetoing it.
    import numpy as _np
    w_prox = _np.ones(n_z)
    nX_ = 20 * (N + 1)
    for i in range(N):
        w_prox[nX_ + 32 * i + 24:nX_ + 32 * i + 32] = 1e-3
    w_prox = jnp.asarray(w_prox)
    S_rows = jnp.zeros((m0, N)).at[n_eq + jnp.arange(N),
                                   jnp.arange(N)].set(-1.0)
    S_pos = jnp.concatenate([jnp.zeros((N, n_z)), jnp.eye(N)], axis=1)
    q_sl = jnp.full(N, W_ELASTIC)

    r_prim = r_dual = jnp.asarray(0.0)
    for _ in range(cfg.sqp_iters):
        c, J = problem.linearize(z, params, cfg)
        b = jnp.matmul(J, z, precision=jax.lax.Precision.HIGHEST) - c
        # proximal (Levenberg-style) damping around the current iterate:
        # bounds the step so the bilinear momentum rows stay within their
        # linearization's validity region
        lam = cfg.sqp_prox
        if cfg.sqp_elastic:
            P_e = jnp.zeros((n_e, n_e))
            P_e = P_e.at[:n_z, :n_z].set(P + lam * jnp.eye(n_z))
            P_e = P_e.at[n_z + jnp.arange(N),
                         n_z + jnp.arange(N)].set(2.0)
            q_e = jnp.concatenate([q - lam * z, q_sl])
            A_e = jnp.concatenate(
                [jnp.concatenate([J, S_rows], axis=1), S_pos], axis=0)
            lyap_viol = jnp.maximum(c[n_eq:n_eq + N], 0.0)
            res = admm_solve(
                P_e, q_e, A_e,
                jnp.concatenate([l_c + b, jnp.zeros(N)]),
                jnp.concatenate([u_c + b, jnp.full(N, jnp.inf)]),
                jnp.concatenate([z, lyap_viol]),
                jnp.concatenate([y, jnp.zeros(N)]), settings)
        else:
            res = admm_solve(P + lam * jnp.diag(w_prox),
                             q - lam * w_prox * z,
                             J, l_c + b, u_c + b, z, y, settings,
                             ocp_perm=ocp_perm)
        dz = jnp.nan_to_num(res.x[:n_z] - z, nan=0.0, posinf=0.0,
                            neginf=0.0)
        # alpha = 0 is always a candidate: a QP step that worsens the merit
        # is rejected outright, so a bad solve can never inject garbage
        # into the warm-start loop (the per-scenario failure-containment
        # the reference lacks — it crashes instead, SURVEY.md §5).
        alphas = (1.0, 0.5, 0.25, 0.0)
        cands = jnp.stack([z + a * dz for a in alphas])
        merits = jax.vmap(merit)(cands)
        best = jnp.argmin(jnp.nan_to_num(merits, nan=jnp.inf))
        z = cands[best]
        # keep the old dual when the step was rejected; clamp to keep the
        # PDAS penalty duals from compounding across ticks
        accepted = best < len(alphas) - 1
        y_new = jnp.clip(jnp.nan_to_num(res.y[:m0]), -1e5, 1e5)
        y = jnp.where(accepted, y_new, y)
        r_prim, r_dual = res.r_prim, res.r_dual

    c_final = con(z)
    n_eq = 20 * (cfg.N + 1)
    lyap = c_final[n_eq:n_eq + cfg.N]
    info = SolveInfo(
        r_prim=r_prim, r_dual=r_dual,
        cost=problem.cost_value(z, params, cfg),
        lyap_violation=jnp.max(jnp.maximum(lyap, 0.0)),
    )
    return SolverState(z=z, y=y), info
