"""Fully-jitted family-wise violation trace over a walk segment (TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop
from cmpc_tpu.ocp import assemble, problem
from cmpc_tpu.plan import com_ref as crm, footsteps, swing, timing as tm

cfg = WalkConfig()
sc = nominal_scenario(cfg, push=(0., 0., 0.), push_window=(0, 0))
timing = tm.build_timing(cfg)
plan0 = footsteps.plan_footsteps(sc.vref, cfg, timing, sc.foot_y)
prl, prr = footsteps.contact_pose_refs(plan0, timing)
cref = crm.build_com_ref(plan0, cfg, timing, sc.foot_y)
refs = assemble.RefArrays(com=cref, pose_ref_l=prl, pose_ref_r=prr)
N = cfg.N
n_eq = 20 * (N + 1)
l_c, u_c = problem.constraint_bounds(cfg)
l_c, u_c = jnp.asarray(l_c), jnp.asarray(u_c)

carry0, tick = closed_loop.rollout(sc, cfg, T_sim=400, return_tick=True)


def params_of(carry, t):
    plan = footsteps.FootstepPlan(pos=carry.plan_pos, yaw=plan0.yaw)
    feet = swing.feet_ref_at(t, plan, cfg, timing, sc.foot_y)
    x0 = assemble.pack_x0(carry.plant.com_pos, carry.plant.com_vel,
                          carry.plant.hw, carry.theta_hat,
                          feet.pose_l, feet.pose_r, t, plan, refs, timing,
                          cfg)
    return assemble.gather_params(t, x0, refs, timing, cfg, sc.k1, sc.k2,
                                  sc.mpc_mass)


def tick2(carry, t):
    params = params_of(carry, t)
    new_carry, tr = tick(carry, t)
    c = problem.constraints(new_carry.solver.z, params, cfg)
    v = jnp.maximum(c - u_c, 0) + jnp.maximum(l_c - c, 0)
    fam = jnp.array([
        v[n_eq:n_eq + N].max(),                 # lyap
        v[n_eq + N:n_eq + N + 1].max(),         # mom
        v[n_eq + N + 1:n_eq + 2 * N + 1].max(),  # height
        v[n_eq + 2 * N + 1:n_eq + 34 * N + 1].max(),  # fric
        v[n_eq + 34 * N + 1:n_eq + 42 * N + 1].max(),  # fz
        v[n_eq + 42 * N + 1:].max(),            # box
        c[n_eq:n_eq + N].max(),                 # raw lyap max (slackness)
    ])
    return new_carry, (tr, fam)


_, (tr, fams) = jax.jit(
    lambda c: jax.lax.scan(tick2, c, jnp.arange(400)))(carry0)
fams = np.asarray(fams)
com, ref = np.asarray(tr.com_pos), np.asarray(tr.com_ref)
err = np.abs(com[:, :2] - ref[:, :2]).max(axis=1)
names = ["lyap", "mom", "height", "fric", "fz", "box"]
for lo, hi in [(150, 200), (200, 280), (280, 400)]:
    seg = fams[lo:hi]
    print(f"ticks {lo}-{hi}: " + "  ".join(
        f"{n}={seg[:, i].max():.4g}@{lo + seg[:, i].argmax()}"
        for i, n in enumerate(names)))
    print(f"   raw lyap max={seg[:, 6].max():.4g} "
          f"p50={np.percentile(seg[:, 6], 50):.4g}")
print("err@[200,220,240,260,270,280,300,350]:",
      np.round(err[[200, 220, 240, 260, 270, 280, 300, 350]], 4))
viol_ticks = np.where(fams[:, :6].max(1) > 0.05)[0]
print("ticks with any viol > 0.05:", viol_ticks[:40])
