"""Jitted dissection of the condip SQP at one single-support tick."""
import sys
import jax
import jax.numpy as jnp
import numpy as np
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop
from cmpc_tpu.ocp import assemble, problem, condense
from cmpc_tpu.ops import sqp
from cmpc_tpu.ops.pdip import pdip_solve, PDIPSettings
from cmpc_tpu.plan import com_ref as crm, footsteps, swing, timing as tm

T0 = int(sys.argv[1]) if len(sys.argv) > 1 else 235
N_SQP = 8

cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0., 0., 0.), push_window=(0, 0))
timing = tm.build_timing(cfg)
plan0 = footsteps.plan_footsteps(sc.vref, cfg, timing, sc.foot_y)
prl, prr = footsteps.contact_pose_refs(plan0, timing)
cref = crm.build_com_ref(plan0, cfg, timing, sc.foot_y)
refs = assemble.RefArrays(com=cref, pose_ref_l=prl, pose_ref_r=prr)
N = cfg.N
nU = 32 * N
n_eq = 20 * (N + 1)
l_c, u_c = problem.constraint_bounds(cfg)
l_c, u_c = jnp.asarray(l_c), jnp.asarray(u_c)

carry0, tick = closed_loop.rollout(sc, cfg, T_sim=400, return_tick=True)


@jax.jit
def dissect(carry0):
    carry, _ = jax.lax.scan(tick, carry0, jnp.arange(T0))
    plan = footsteps.FootstepPlan(pos=carry.plan_pos, yaw=plan0.yaw)
    feet = swing.feet_ref_at(T0, plan, cfg, timing, sc.foot_y)
    x0 = assemble.pack_x0(carry.plant.com_pos, carry.plant.com_vel,
                          carry.plant.hw, carry.theta_hat,
                          feet.pose_l, feet.pose_r, T0, plan, refs, timing,
                          cfg)
    params = assemble.gather_params(T0, x0, refs, timing, cfg, sc.k1, sc.k2,
                                    sc.mpc_mass)

    w_prox_u = jnp.ones(nU).reshape(N, 32).at[:, 24:].set(1e-3).reshape(-1)
    settings = PDIPSettings(iters=cfg.pdip_iters)
    ns = condense.n_slack(cfg)
    lam_soft = jnp.clip(carry.solver.y[n_eq:n_eq + ns], 0.0, 1e4)

    U = sqp.prep_warmstart(carry.solver, params, cfg)
    X = sqp._rollout_X(params.x0, U, params, cfg)

    def merit_of(Xc, Uc):
        zc = problem.join_z(Xc, Uc)
        c = problem.constraints(zc, params, cfg)[n_eq:]
        viol = jnp.sum(jnp.maximum(c - u_c[n_eq:], 0.0)
                       + jnp.maximum(l_c[n_eq:] - c, 0.0))
        return problem.cost_value(zc, params, cfg) \
            + condense.W_ELASTIC * viol

    def fam_viol(Xc, Uc):
        zc = problem.join_z(Xc, Uc)
        c = problem.constraints(zc, params, cfg)
        v = jnp.maximum(c - u_c, 0) + jnp.maximum(l_c - c, 0)
        return jnp.array([v[n_eq:n_eq + N].max(),
                          v[n_eq + N], v[n_eq + N + 1:].max()])

    rows = []
    for it in range(N_SQP):
        z = problem.join_z(X, U)
        qp = condense.build(z, params, cfg, cfg.condip_prox, w_prox_u,
                            lam_soft=lam_soft, soft=cfg.condip_soft)
        res = pdip_solve(qp.H, qp.g, qp.C, qp.d, settings)
        dU = jnp.nan_to_num(res.v[:nU]).reshape(N, 32)
        lam_soft = jnp.clip(jnp.nan_to_num(res.lam[:ns] * qp.row_scale[:ns]),
                            0.0, 1e4)
        alphas = (1.0, 0.5, 0.25, 0.0)
        U_cands = jnp.stack([U + a * dU for a in alphas])
        X_cands = jax.vmap(
            lambda Uc: sqp._rollout_X(params.x0, Uc, params, cfg))(U_cands)
        merits = jax.vmap(merit_of)(X_cands, U_cands)
        best = jnp.argmin(jnp.nan_to_num(merits, nan=jnp.inf))
        fv1 = fam_viol(X_cands[0], U_cands[0])      # alpha = 1
        U = U_cands[best]
        X = X_cands[best]
        fvb = fam_viol(X, U)
        rows.append(jnp.concatenate([
            jnp.array([best, res.r_prim, res.r_dual, res.mu,
                       jnp.abs(dU[:, :24]).max(),
                       jnp.abs(dU[:, 24:30]).max()]),
            fv1, fvb, merits]))
    return jnp.stack(rows), params.gamma_l, params.gamma_r


rows, gl, gr = dissect(carry0)
rows = np.asarray(rows)
print("gamma_l:", np.asarray(gl), "gamma_r:", np.asarray(gr))
hdr = ("it best r_prim r_dual mu |dF| |dv| "
       "a1[lyap mom rest] ab[lyap mom rest] merits")
print(hdr)
for i, r in enumerate(rows):
    print(f"{i} a={(1.0, 0.5, 0.25, 0.0)[int(r[0])]} rp={r[1]:.2e} "
          f"rd={r[2]:.2e} mu={r[3]:.2e} dF={r[4]:.1f} dv={r[5]:.2f} | "
          f"a1: ly={r[6]:.4f} mom={r[7]:.4f} rest={r[8]:.4f} | "
          f"ab: ly={r[9]:.4f} mom={r[10]:.4f} rest={r[11]:.4f} | "
          f"m={np.round(r[12:], 1)}")
