"""Unit tests of the condensing algebra (ocp/condense.py).

VERDICT round-2 #3: every delicate hand-derived piece — the E recursion,
the condensed cost, the soft-row constraint Hessian — gets a direct
autodiff cross-check so a refactor cannot silently break the production
"condip" solver path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.models import centroidal as cm
from cmpc_tpu.ocp import condense, problem
from cmpc_tpu.ops import sqp

from tests.test_ocp_solver import make_params
from tests.test_pdip import _walking_params


def _base_point(cfg, p, key):
    """A feasible-dynamics base point: X = rollout(x0, U)."""
    state = sqp.init_solver_state(cfg, p.x0, mass=float(p.mass))
    U = sqp.prep_warmstart(state, p, cfg)
    U = U + 0.01 * jax.random.normal(key, U.shape)
    X = sqp._rollout_X(p.x0, U, p, cfg)
    return problem.join_z(X, U), U


@pytest.mark.parametrize("walking", [False, True])
def test_E_matches_rollout_jacobian(walking):
    """E must equal d vec(rollout(x0, U)) / d vec(U) (f64)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = WalkConfig()
        p = _walking_params(cfg) if walking else make_params(
            cfg, jax.random.PRNGKey(0), standing=True)
        p = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), p)
        z, U = _base_point(cfg, p, jax.random.PRNGKey(1))
        qp = condense.build(z, p, cfg, 0.0, jnp.ones(32 * cfg.N),
                            lam_soft=None, soft=False)
        E_auto = jax.jacfwd(
            lambda Uf: sqp._rollout_X(
                p.x0, Uf.reshape(cfg.N, 32), p, cfg).reshape(-1))(
            U.reshape(-1))
        assert float(jnp.abs(qp.E - E_auto).max()) < 1e-8
    finally:
        jax.config.update("jax_enable_x64", old)


def test_condensed_cost_matches_full():
    """The condensed quadratic model in dU must equal the full-space model
    restricted to the dynamics manifold dz = [E dU, dU] (f64)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = WalkConfig()
        p = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64),
            _walking_params(cfg))
        z, U = _base_point(cfg, p, jax.random.PRNGKey(2))
        nU = 32 * cfg.N
        qp = condense.build(z, p, cfg, 0.0, jnp.ones(nU),
                            lam_soft=None, soft=False)

        P, q = problem.cost_quadratic(p, cfg)
        rng = np.random.default_rng(0)
        for _ in range(3):
            dU = jnp.asarray(rng.normal(size=nU) * 0.05)
            dz = jnp.concatenate([qp.E @ dU, dU])
            full = 0.5 * dz @ P @ dz + (P @ z + q) @ dz
            cond = 0.5 * dU @ qp.H[:nU, :nU] @ dU + qp.g[:nU] @ dU
            np.testing.assert_allclose(float(cond), float(full),
                                       rtol=1e-9, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", old)


def test_condensed_rows_match_linearized_constraints():
    """Each condensed row (after undoing row_scale) must be the linearized
    inequality-constraint row restricted to the manifold, with d the slack
    to its bound (f64).  Covers the [soft-less] hard/box row plumbing."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = WalkConfig()
        N = cfg.N
        p = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64),
            _walking_params(cfg))
        z, U = _base_point(cfg, p, jax.random.PRNGKey(4))
        nU = 32 * N
        n_eq = 20 * (N + 1)
        qp = condense.build(z, p, cfg, 0.0, jnp.ones(nU),
                            lam_soft=None, soft=False)

        c, J = problem.linearize(z, p, cfg)
        l_all, u_all = problem.constraint_bounds(cfg)
        G = J[n_eq:, :20 * (N + 1)] @ qp.E + J[n_eq:, 20 * (N + 1):]
        c_in = c[n_eq:]
        hi = jnp.asarray(u_all[n_eq:])
        lo = jnp.asarray(l_all[n_eq:])
        hi = hi.at[:N].add(-condense.SOFT_MARGIN)

        m_one = G.shape[0]          # one-sided rows (incl. boxes' hi side)
        n_box = 6 * N
        # undo row scaling
        C_uns = qp.C / jnp.maximum(qp.row_scale[:, None], 1e-300)
        d_uns = qp.d / jnp.maximum(qp.row_scale, 1e-300)
        # recompute the vacuous-row mask exactly as condense.build does
        # (rows in the same [G; -G_box] order)
        C_pre = jnp.concatenate([G, -G[m_one - n_box:]], axis=0)
        vac = jnp.max(jnp.abs(C_pre), axis=1) < 1e-9

        # hi-side rows: first m_one rows of C
        err_C = jnp.abs(C_uns[:m_one] - G)
        err_d = jnp.abs(d_uns[:m_one] - (hi - c_in))
        ok = ~vac[:m_one]
        assert float(jnp.where(ok[:, None], err_C, 0.0).max()) < 1e-9
        assert float(jnp.where(ok, err_d, 0.0).max()) < 1e-9

        # lo-side box rows: next n_box rows are -G_box, c - lo
        Gb = G[m_one - n_box:]
        cb = c_in[m_one - n_box:]
        lob = lo[m_one - n_box:]
        err_C2 = jnp.abs(C_uns[m_one:m_one + n_box] + Gb)
        err_d2 = jnp.abs(d_uns[m_one:m_one + n_box] - (cb - lob))
        ok2 = ~vac[m_one:m_one + n_box]
        assert float(jnp.where(ok2[:, None], err_C2, 0.0).max()) < 1e-9
        assert float(jnp.where(ok2, err_d2, 0.0).max()) < 1e-9
    finally:
        jax.config.update("jax_enable_x64", old)


def test_soft_row_hessian_matches_autodiff():
    """The un-projected soft-row Hessian must equal
    jax.hessian(lam @ c_soft(z)) exactly; the projected one must be PSD and
    differ from it only in the negative-curvature subspace (f64)."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        cfg = WalkConfig()
        N = cfg.N
        n_eq = 20 * (N + 1)
        p = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64),
            _walking_params(cfg))
        rng = np.random.default_rng(5)
        lam = jnp.asarray(rng.uniform(0.5, 3.0, size=N + 1))

        def lam_c(z):
            c = problem.constraints(z, p, cfg)
            return lam[:N] @ c[n_eq:n_eq + N] + lam[N] * c[n_eq + N]

        z = jnp.asarray(rng.normal(size=cfg.n_z) * 0.05)
        H_auto = jax.hessian(lam_c)(z)
        # the hand Hessian intentionally omits the momentum row's -2I on
        # hw_0: dx_0 = 0 in the condensed subproblem, so that block is
        # inert (condense.soft_row_hessian docstring)
        H_auto = H_auto.at[6:9, 6:9].add(2.0 * lam[N] * jnp.eye(3))
        H_hand = condense.soft_row_hessian(lam, p, cfg, psd=False)
        assert float(jnp.abs(H_hand - H_auto).max()) < 1e-9

        H_psd = condense.soft_row_hessian(lam, p, cfg, psd=True)
        ew = jnp.linalg.eigvalsh(H_psd)
        assert float(ew.min()) > -1e-9
    finally:
        jax.config.update("jax_enable_x64", old)


def test_structured_build_matches_dense():
    """structured=True pulls the 40-per-stage friction/unilaterality rows
    out of C into per-stage (40, 24) input-local blocks (the IPM Newton
    fast path).  Reassembling the full constraint matrix from the pieces
    must reproduce the dense build bit-for-bit, and the interior-point
    solve on both forms must agree."""
    import numpy as np
    from cmpc_tpu.config import WalkConfig, nominal_scenario
    from cmpc_tpu.ocp import assemble
    from cmpc_tpu.ops import sqp
    from cmpc_tpu.ops.pdip import PDIPSettings, pdip_solve
    from cmpc_tpu.plan import com_ref as crm, footsteps, timing as tm

    cfg = WalkConfig()
    timing = tm.build_timing(cfg)
    sc = nominal_scenario(cfg)
    plan = footsteps.plan_footsteps(sc.vref, cfg, timing, sc.foot_y)
    pl_, pr_ = footsteps.contact_pose_refs(plan, timing)
    cref = crm.build_com_ref(plan, cfg, timing, sc.foot_y)
    refs = assemble.RefArrays(com=cref, pose_ref_l=pl_, pose_ref_r=pr_)
    N, nU = cfg.N, 32 * cfg.N
    w_prox_u = jnp.ones(nU).reshape(N, 32).at[:, 24:].set(1e-3).reshape(-1)
    lam = jnp.zeros(condense.n_slack(cfg))

    for t_ in (50, 250):      # double support + landing-in-horizon tick
        t = jnp.asarray(t_)
        x0 = assemble.pack_x0(cref.pos[t_] + 0.004, cref.vel[t_],
                              jnp.zeros(3), jnp.zeros(3), pl_[t_], pr_[t_],
                              t, plan, refs, timing, cfg)
        p = assemble.gather_params(t, x0, refs, timing, cfg,
                                   sc.k1, sc.k2, sc.mpc_mass)
        state = sqp.init_solver_state(cfg, x0, mass=sc.mpc_mass)
        U = sqp.prep_warmstart(state, p, cfg)
        X = sqp._rollout_X(p.x0, U, p, cfg)
        z = problem.join_z(X, U)
        qpd = condense.build(z, p, cfg, 0.1, w_prox_u, lam_soft=lam,
                             soft=cfg.condip_soft)
        qps = condense.build(z, p, cfg, 0.1, w_prox_u, lam_soft=lam,
                             soft=cfg.condip_soft, structured=True)
        # reassemble dense-order rows from the structured pieces
        rows, dvals = [], []
        for r0, nr, in ((0, 16), (16, 16), (32, 4), (36, 4)):
            blk = np.zeros((N, nr, nU), np.float32)
            for i in range(N):
                blk[i, :, 32 * i:32 * i + 24] = np.asarray(
                    qps.C_blk[i, r0:r0 + nr])
            rows.append(blk.reshape(N * nr, nU))
            dvals.append(np.asarray(qps.d_blk[:, r0:r0 + nr]).reshape(-1))
        C_re = np.concatenate([np.asarray(qps.C[:2 * N + 1]), *rows,
                               np.asarray(qps.C[2 * N + 1:])], axis=0)
        d_re = np.concatenate([np.asarray(qps.d[:2 * N + 1]), *dvals,
                               np.asarray(qps.d[2 * N + 1:])])
        # lyap rows are contracted per-stage (gx @ E_i + ...) instead of
        # through the dense J_x E matmul — identical up to f32 summation
        # order (~1e-9); everything else is bit-identical
        np.testing.assert_allclose(C_re, np.asarray(qpd.C), atol=1e-7)
        np.testing.assert_allclose(d_re, np.asarray(qpd.d), atol=1e-7)
        np.testing.assert_allclose(np.asarray(qps.H), np.asarray(qpd.H),
                                   atol=1e-6)

        st = PDIPSettings(iters=cfg.pdip_iters, refine=cfg.pdip_refine)
        rd = pdip_solve(qpd.H, qpd.g, qpd.C, qpd.d, st)
        rs = pdip_solve(qps.H, qps.g, qps.C, qps.d, st,
                        C_blk=qps.C_blk, d_blk=qps.d_blk)
        assert float(jnp.abs(rd.v - rs.v).max()) < 1e-3
        assert abs(float(rd.r_prim) - float(rs.r_prim)) < 1e-4
