"""Closed loop with an IDEAL plant (com state := MPC x1 every tick).
If this tracks, the MPC solutions are fine and the failure lives in the
plant-lag interaction; if it drifts, the MPC solutions themselves drift."""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.models import centroidal as cm
from cmpc_tpu.ocp import assemble, problem
from cmpc_tpu.ops import sqp
from cmpc_tpu.plan import com_ref as crm, footsteps, swing, timing as tm

cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0.,0.,0.), push_window=(0,0))
timing = tm.build_timing(cfg)
plan0 = footsteps.plan_footsteps(sc.vref, cfg, timing, sc.foot_y)
prl, prr = footsteps.contact_pose_refs(plan0, timing)
cref = crm.build_com_ref(plan0, cfg, timing, sc.foot_y)
refs = assemble.RefArrays(com=cref, pose_ref_l=prl, pose_ref_r=prr)

def tick(carry, t):
    com_pos, com_vel, hw, theta, plan_pos, sol = carry
    plan = footsteps.FootstepPlan(pos=plan_pos, yaw=plan0.yaw)
    feet = swing.feet_ref_at(t, plan, cfg, timing, sc.foot_y)
    x0 = assemble.pack_x0(com_pos, com_vel, hw, theta, feet.pose_l,
                          feet.pose_r, t, plan, refs, timing, cfg)
    params = assemble.gather_params(t, x0, refs, timing, cfg, sc.k1, sc.k2, sc.mpc_mass)
    sol, info = sqp.solve_mpc(sol, params, cfg)
    X, _ = problem.split_z(sol.z, cfg)
    x1 = X[1]
    # footstep adaptation
    sil = jnp.asarray(timing.foot_is_left)[jnp.asarray(timing.step_idx)][t]
    newc = jnp.where(sil, X[cfg.N, cm.POS_R], X[cfg.N, cm.POS_L])
    do = jnp.asarray(timing.update_event)[t]
    plan_pos = jnp.where(do, plan_pos.at[jnp.asarray(timing.adapt_target)[t]].set(newc), plan_pos)
    carry = (x1[cm.P_COM], x1[cm.V_COM], x1[cm.H_W], x1[cm.THETA], plan_pos, sol)
    return carry, (com_pos, refs.com.pos[t], info.r_prim)

x0i = jnp.zeros(20).at[cm.P_COM].set(sc.init_com)
carry0 = (sc.init_com, sc.init_vel, jnp.zeros(3), jnp.zeros(3),
          plan0.pos, sqp.init_solver_state(cfg, x0i, mass=sc.mpc_mass))
carry, (com, ref, rp) = jax.jit(lambda c: jax.lax.scan(tick, c, jnp.arange(400)))(carry0)
com, ref, rp = np.asarray(com), np.asarray(ref), np.asarray(rp)
err = np.abs(com[:, :2] - ref[:, :2]).max(axis=1)
bad = np.where(err > 0.05)[0]
print("IDEAL PLANT: max err", err.max(), "first>0.05:", bad[0] if len(bad) else None)
print("err @180..400 step20:", np.round(err[180:400:20], 4))
print("r_prim p50/max:", np.percentile(rp, 50), rp.max())
