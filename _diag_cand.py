import jax, pickle
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop
from cmpc_tpu.ocp import assemble, problem, condense
from cmpc_tpu.ops import sqp
from cmpc_tpu.ops.pdip import pdip_solve, PDIPSettings

cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
T0 = 225
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
N = cfg.N; nU = 32*N; n_eq = 20*(N+1)
l_c, u_c = problem.constraint_bounds(cfg)
w_prox_u = jnp.ones(nU).reshape(N,32).at[:,24:].set(1e-3).reshape(-1)
U = sqp.prep_warmstart(carry.solver, params, cfg)
X = sqp._rollout_X(params.x0, U, params, cfg)
print("x0:", np.asarray(x0).round(4))
fam_sl = {"lyap": (0, N), "mom": (N, N+1), "height": (N+1, 2*N+1),
          "fric": (2*N+1, 34*N+1), "fz": (34*N+1, 42*N+1), "box": (42*N+1, 53*N+1)}
def vrep(z):
    c = np.asarray(problem.constraints(z, params, cfg))[n_eq:]
    v = np.maximum(c - u_c[n_eq:], 0) + np.maximum(l_c[n_eq:] - c, 0)
    return {k: round(float(v[a:b].sum()), 4) for k, (a, b) in fam_sl.items()}
z = problem.join_z(X, U)
print("base viol:", vrep(z), "cost", round(float(problem.cost_value(z, params, cfg)),1))
qp = condense.build(z, params, cfg, cfg.condip_prox, w_prox_u)
res = pdip_solve(qp.H, qp.g, qp.C, qp.d, PDIPSettings(iters=15))
print("pdip mu", float(res.mu), "slacks", np.asarray(res.v[nU:]).round(4))
dU = np.asarray(res.v[:nU]).reshape(N, 32)
# predicted (linearized) constraint change vs actual for a few alphas
for a in (1.0, 0.5, 0.25, 0.1, 0.05):
    Uc = U + a*jnp.asarray(dU)
    Xc = sqp._rollout_X(params.x0, Uc, params, cfg)
    zc = problem.join_z(Xc, Uc)
    print(f"alpha={a}: viol {vrep(zc)} cost {round(float(problem.cost_value(zc, params, cfg)),1)}")
