import sys, jax
import numpy as np, jax.numpy as jnp
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop
from cmpc_tpu.ocp import assemble, problem, condense
from cmpc_tpu.ops import sqp
from cmpc_tpu.ops.pdip import pdip_solve, PDIPSettings

cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
carry, tick = closed_loop.rollout(sc, cfg, T_sim=500, return_tick=True)
tick_j = jax.jit(tick)
T0 = 225
for t in range(T0):
    carry, tr = tick_j(carry, t)

# replicate the tick's param assembly at t=T0
from cmpc_tpu.plan import com_ref as crm, footsteps, swing, timing as tm
timing = tm.build_timing(cfg)
plan0 = footsteps.plan_footsteps(sc.vref, cfg, timing, sc.foot_y)
prl, prr = footsteps.contact_pose_refs(plan0, timing)
cref = crm.build_com_ref(plan0, cfg, timing, sc.foot_y)
refs = assemble.RefArrays(com=cref, pose_ref_l=prl, pose_ref_r=prr)
plan = footsteps.FootstepPlan(pos=carry.plan_pos, yaw=plan0.yaw)
feet = swing.feet_ref_at(T0, plan, cfg, timing, sc.foot_y)
x0 = assemble.pack_x0(carry.plant.com_pos, carry.plant.com_vel, carry.plant.hw,
                      carry.theta_hat, feet.pose_l, feet.pose_r, T0, plan, refs, timing, cfg)
params = assemble.gather_params(T0, x0, refs, timing, cfg, sc.k1, sc.k2, sc.mpc_mass)
print("gamma_l", np.asarray(params.gamma_l), "gamma_r", np.asarray(params.gamma_r))
print("x0 com", np.asarray(x0[:6]).round(4), "theta", np.asarray(x0[9:12]).round(3))

N = cfg.N; nU = 32*N; n_eq = 20*(N+1)
l_c, u_c = problem.constraint_bounds(cfg)
w_prox_u = jnp.ones(nU).reshape(N,32).at[:,24:].set(1e-3).reshape(-1)
U = sqp.prep_warmstart(carry.solver, params, cfg)
X = sqp._rollout_X(params.x0, U, params, cfg)

def viol_report(z, tag):
    c = np.asarray(problem.constraints(z, params, cfg))
    v = np.maximum(c - u_c, 0) + np.maximum(l_c - c, 0)
    fam = {"init": v[:20], "dyn": v[20:n_eq], "lyap": v[n_eq:n_eq+N],
           "mom": v[n_eq+N:n_eq+N+1], "height": v[n_eq+N+1:n_eq+2*N+1],
           "fric": v[n_eq+2*N+1:n_eq+34*N+1], "fz": v[n_eq+34*N+1:n_eq+42*N+1],
           "box": v[n_eq+42*N+1:]}
    print(tag, {k: round(float(x.max()),5) for k,x in fam.items()},
          "cost", round(float(problem.cost_value(z, params, cfg)),2))

for it in range(3):
    z = problem.join_z(X, U)
    viol_report(z, f"iter{it} base:")
    qp = condense.build(z, params, cfg, cfg.condip_prox, w_prox_u)
    res = pdip_solve(qp.H, qp.g, qp.C, qp.d, PDIPSettings(iters=cfg.pdip_iters))
    print(f"  pdip: r_prim={float(res.r_prim):.2e} r_dual={float(res.r_dual):.2e} mu={float(res.mu):.2e}")
    s = np.asarray(res.v[nU:])
    print("  slacks:", s.round(5))
    dU = np.asarray(res.v[:nU]).reshape(N,32)
    print("  |dU| max force", np.abs(dU[:, :24]).max(), "max vel", np.abs(dU[:, 24:30]).max())
    alphas = (1.0, 0.5, 0.25, 0.0)
    merits = []
    for a in alphas:
        Uc = U + a*jnp.asarray(dU)
        Xc = sqp._rollout_X(params.x0, Uc, params, cfg)
        zc = problem.join_z(Xc, Uc)
        c = np.asarray(problem.constraints(zc, params, cfg))[n_eq:]
        viol = np.maximum(c - u_c[n_eq:],0).sum() + np.maximum(l_c[n_eq:]-c,0).sum()
        merits.append(float(problem.cost_value(zc, params, cfg)) + 1e4*viol)
    print("  merits:", [round(m,1) for m in merits])
    best = int(np.argmin(merits))
    print("  chosen alpha:", alphas[best])
    U = U + alphas[best]*jnp.asarray(dU)
    X = sqp._rollout_X(params.x0, U, params, cfg)
viol_report(problem.join_z(X,U), "final:")
