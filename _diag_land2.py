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
    X, U = problem.split_z(sol.z, cfg)
    x1 = X[1]
    sil = jnp.asarray(timing.foot_is_left)[jnp.asarray(timing.step_idx)][t]
    newc = jnp.where(sil, X[cfg.N, cm.POS_R], X[cfg.N, cm.POS_L])
    do = jnp.asarray(timing.update_event)[t]
    plan_pos = jnp.where(do, plan_pos.at[jnp.asarray(timing.adapt_target)[t]].set(newc), plan_pos)
    carry = (x1[cm.P_COM], x1[cm.V_COM], x1[cm.H_W], x1[cm.THETA], plan_pos, sol)
    out = (com_pos, com_vel, refs.com.pos[t], refs.com.vel[t], info.r_prim,
           info.lyap_violation, info.r_dual, x1[cm.H_W], U[0], do, newc)
    return carry, out

x0i = jnp.zeros(20).at[cm.P_COM].set(sc.init_com)
carry0 = (sc.init_com, sc.init_vel, jnp.zeros(3), jnp.zeros(3),
          plan0.pos, sqp.init_solver_state(cfg, x0i, mass=sc.mpc_mass))
carry, out = jax.jit(lambda c: jax.lax.scan(tick, c, jnp.arange(320)))(carry0)
com, vel, ref, refv, rp, lyv, rd, hw, U0, ad, nc = [np.asarray(o) for o in out]
for t in range(248, 310):
    fz = U0[t, 0:24].reshape(8,3)[:,2]
    print(f"t={t} err={np.abs(com[t,:2]-ref[t,:2]).max():.4f} vy_err={vel[t,1]-refv[t,1]:+.3f} "
          f"r_prim={rp[t]:.2e} lyap={lyv[t]:.2e} hw={hw[t].round(2)} fzL={fz[:4].sum():.0f} fzR={fz[4:].sum():.0f}"
          + (f" ADAPT->{nc[t].round(3)}" if ad[t] else ""))
