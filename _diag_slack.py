import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop
from cmpc_tpu.ocp import assemble, problem, condense
from cmpc_tpu.ops import sqp
from cmpc_tpu.ops.pdip import pdip_solve, PDIPSettings

cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
T0 = 215
carry, _ = jax.jit(lambda s: closed_loop.rollout(s, cfg, T_sim=T0))(sc)
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
N = cfg.N; nU = 32*N; n_eq = 20*(N+1); ns = condense.n_slack(cfg)
w_prox_u = jnp.ones(nU).reshape(N,32).at[:,24:].set(1e-3).reshape(-1)
U = sqp.prep_warmstart(carry.solver, params, cfg)
X = sqp._rollout_X(params.x0, U, params, cfg)
lam_soft = jnp.clip(carry.solver.y[n_eq:n_eq+ns], 0.0, condense.W_ELASTIC)
z = problem.join_z(X, U)
qp = condense.build(z, params, cfg, cfg.condip_prox, w_prox_u, lam_soft=lam_soft)
res = pdip_solve(qp.H, qp.g, qp.C, qp.d, PDIPSettings(iters=15))
s = np.asarray(res.v[nU:])
print("slacks:", s.round(6))
print("mu:", float(res.mu), "r_prim(QP):", float(res.r_prim))
# row margins: Cv - d for the soft rows
Cv = np.asarray(qp.C @ res.v - qp.d)
print("soft row Cv-d:", Cv[:ns].round(6))
# base nonlinear values of soft rows
c = np.asarray(problem.constraints(z, params, cfg))[n_eq:n_eq+ns]
print("c_soft at base:", c.round(5))
print("lam_soft carried:", np.asarray(lam_soft).round(1))
print("prox cost of step: ", float(cfg.condip_prox*jnp.sum(w_prox_u*res.v[:nU]**2)))
dU = np.asarray(res.v[:nU]).reshape(N,32)
print("|dF| max:", np.abs(dU[:,:24]).max(), "|dV| max:", np.abs(dU[:,24:30]).max())
