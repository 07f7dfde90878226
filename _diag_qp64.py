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
carry, tick = closed_loop.rollout(sc, cfg, T_sim=500, return_tick=True)
tick_j = jax.jit(tick)
for t in range(225):
    carry, tr = tick_j(carry, t)

from cmpc_tpu.plan import com_ref as crm, footsteps, swing, timing as tm
timing = tm.build_timing(cfg)
plan0 = footsteps.plan_footsteps(sc.vref, cfg, timing, sc.foot_y)
prl, prr = footsteps.contact_pose_refs(plan0, timing)
cref = crm.build_com_ref(plan0, cfg, timing, sc.foot_y)
refs = assemble.RefArrays(com=cref, pose_ref_l=prl, pose_ref_r=prr)
plan = footsteps.FootstepPlan(pos=carry.plan_pos, yaw=plan0.yaw)
feet = swing.feet_ref_at(225, plan, cfg, timing, sc.foot_y)
x0 = assemble.pack_x0(carry.plant.com_pos, carry.plant.com_vel, carry.plant.hw,
                      carry.theta_hat, feet.pose_l, feet.pose_r, 225, plan, refs, timing, cfg)
params = assemble.gather_params(225, x0, refs, timing, cfg, sc.k1, sc.k2, sc.mpc_mass)
N = cfg.N; nU = 32*N
w_prox_u = jnp.ones(nU).reshape(N,32).at[:,24:].set(1e-3).reshape(-1)
U = sqp.prep_warmstart(carry.solver, params, cfg)
X = sqp._rollout_X(params.x0, U, params, cfg)
z = problem.join_z(X, U)
qp = condense.build(z, params, cfg, cfg.condip_prox, w_prox_u)
np.save("/tmp/qpH.npy", np.asarray(qp.H)); np.save("/tmp/qpg.npy", np.asarray(qp.g))
np.save("/tmp/qpC.npy", np.asarray(qp.C)); np.save("/tmp/qpd.npy", np.asarray(qp.d))

for iters in (15, 30):
    for dt in (jnp.float32, jnp.float64):
        jax.config.update("jax_enable_x64", dt == jnp.float64)
        H, g, C, d = (jnp.asarray(np.asarray(a), dt) for a in (qp.H, qp.g, qp.C, qp.d))
        res = pdip_solve(H, g, C, d, PDIPSettings(iters=iters))
        obj = float(0.5*res.v@H@res.v + g@res.v)
        print(f"iters={iters} {dt.__name__}: r_prim={float(res.r_prim):.2e} r_dual={float(res.r_dual):.2e} mu={float(res.mu):.3e} obj={obj:.1f} smax={float(jnp.max(res.v[nU:])):.3f}")
