"""Centroidal plant for closed-loop evaluation.

The reference closes its loop against DART whole-body physics through a
task-space inverse-dynamics QP: the MPC's desired CoM trajectory is tracked
by a PD+feedforward acceleration task (com pos_gain=5, vel_gain=10,
inverse_dynamics.py:41-44), and the resulting torques drive the simulator.
The MPC's vertex forces are *never applied open-loop* — applying them raw
destabilizes the loop (the MPC relies on re-planning + the ID layer's
feedback, exactly like the reference).

Porting DART is an explicit non-goal (SURVEY.md §7): this plant is the
centroidal-level abstraction of {ID QP + rigid-body physics}:

* commanded CoM force = mpc_mass * (acc_pd - g), acc_pd = ff + PD on the
  MPC's desired CoM state — what the ID layer would realize with its model;
* achieved acceleration = (commanded force + external push) / plant_mass + g
  — model mismatch (payload) and disturbances enter exactly where the
  reference's scenarios put them;
* angular momentum integrates the torque of the REALIZED contact wrench —
  the commanded CoM force applied at the demanded zero-moment point,
  CLAMPED to the support polygon.  The ID layer never tracks the MPC's
  planned vertex torques (its tasks are CoM + poses, inverse_dynamics.py:
  41-106), so the plant's angular channel must not integrate them either:
  it integrates the moment physics actually produces.  While the demanded
  ZMP is realizable (inside the support region) the GRF passes through it
  and dhw ~ 0; once the CoM dynamics demand a ZMP outside the support
  polygon (mid-single-support), the clamp yields the honest tipping
  torque and |hw| grows — exactly what the reference's DART robot does
  (measured |hw| grows 0.03 -> 1.8 over the first single support,
  original_code/cuhw.txt), alternating sign with the support side so it
  stays bounded over the walk.  Two designs that fail here, measured:
  integrating the MPC's planned torques freezes |hw| on the momentum-
  constraint sphere until the NLP goes infeasible against physics (the
  round-1/2 first-landing divergence); integrating them against the
  reflected hw measurement (cfg.hw_meas_negated) is positive feedback
  and |hw| explodes during the initial double support.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cmpc_tpu.models import centroidal as cm

# ID-layer CoM task gains (inverse_dynamics.py:43-44)
COM_POS_GAIN = 5.0
COM_VEL_GAIN = 10.0

# Default whole-body angular compliance: only a fraction of the moment
# the CoM force demands beyond the support polygon materializes as
# centroidal angular-momentum growth — the articulated robot absorbs the
# rest in posture deviation (the ID trades the angular tasks against the
# CoM task).  Calibrated against the reference's first single support:
# measured dhw ~ 2.5 N m against a ~7 N m out-of-polygon demand
# (cuhw.txt ticks 205-270 vs hw_des.txt plans) => ~0.35.  This also
# bounds the reflected-measurement feedback loop (see
# WalkConfig.hw_meas_negated): plant tipping gain ~ 0.35x the model's
# planned shed keeps the per-step momentum cycle contractive, where a
# rigid point-contact plant (factor 1.0) ratchets |hw| up each step
# (measured: 6.5 -> 22 -> 41 across three steps, then a fall).
HW_COMPLIANCE = 0.35

# Default effective angular-momentum shedding rate (1/s): the whole-body
# controller's torso/base angular tasks damp body rotation, which bleeds
# centroidal angular momentum whenever the support polygon leaves CoP
# room — the reference's measured |hw| decays ~1.8 -> 1.2 across one
# 0.3 s double support (original_code/cuhw.txt ticks 270-300), ~1.3/s.
# Modeled as a CoP offset producing dhw_xy = -SHED * hw_xy (clamped to
# the polygon) plus a yaw friction moment dhw_z = -SHED * hw_z (stance
# feet provide free yaw friction torque within the polygon).
HW_SHED_RATE = 1.3


class PlantState(NamedTuple):
    com_pos: jnp.ndarray  # (3,)
    com_vel: jnp.ndarray  # (3,)
    hw: jnp.ndarray       # (3,)


def plant_step(ps: PlantState, com_des_pos, com_des_vel, com_des_acc,
               u0, gamma_l, gamma_r, pose_l, pose_r,
               mpc_mass, plant_mass, ext_force, ext_torque, g, polygon, dt,
               hw_compliance: float = HW_COMPLIANCE,
               hw_shed: float = HW_SHED_RATE) -> PlantState:
    """One Euler step of the plant under the ID-equivalent CoM tracking law.

    pose_l / pose_r: [ang(3), pos(3)] actual foot poses (kinematic tracking
    of the commanded swing trajectories is assumed).
    """
    gravity = jnp.array([0.0, 0.0, -1.0]) * g

    acc_pd = (com_des_acc
              + COM_VEL_GAIN * (com_des_vel - ps.com_vel)
              + COM_POS_GAIN * (com_des_pos - ps.com_pos))
    force_cmd = mpc_mass * (acc_pd - gravity)
    acc = gravity + (force_cmd + ext_force) / plant_mass

    # Realized wrench: F at the demanded ZMP (the ground point where the
    # GRF line of action leaves zero horizontal moment about the CoM),
    # clamped to the axis-aligned hull of the active feet's vertices.
    # The external push acts at the CoM => no moment of its own.
    F = force_cmd + ext_force
    fz = jnp.maximum(F[2], 1e-3)
    zmp_xy = ps.com_pos[:2] - ps.com_pos[2] * F[:2] / fz
    # hw-shedding CoP offset: dhw_x = fz*(y_cop - y_zmp) := -SHED*hw_x,
    # dhw_y = -fz*(x_cop - x_zmp) := -SHED*hw_y.  Divided by compliance
    # because the realized torque below is scaled by it.
    zmp_xy = zmp_xy + (hw_shed / hw_compliance) * jnp.stack(
        [ps.hw[1], -ps.hw[0]]) / fz

    verts_l = cm.foot_vertices(pose_l[3:6], pose_l[2], polygon)   # (4,3)
    verts_r = cm.foot_vertices(pose_r[3:6], pose_r[2], polygon)
    big = jnp.asarray(1e6)
    lo_l = jnp.where(gamma_l > 0.5, verts_l[:, :2].min(0), big)
    lo_r = jnp.where(gamma_r > 0.5, verts_r[:, :2].min(0), big)
    hi_l = jnp.where(gamma_l > 0.5, verts_l[:, :2].max(0), -big)
    hi_r = jnp.where(gamma_r > 0.5, verts_r[:, :2].max(0), -big)
    lo = jnp.minimum(lo_l, lo_r)
    hi = jnp.maximum(hi_l, hi_r)
    # flight (no active contact) cannot occur in this gait; guard anyway
    ok = (gamma_l > 0.5) | (gamma_r > 0.5)
    p_cop_xy = jnp.clip(zmp_xy, lo, hi)
    p_cop = jnp.concatenate([p_cop_xy, jnp.zeros(1)])
    tau_grf = jnp.where(ok, jnp.cross(p_cop - ps.com_pos, F), jnp.zeros(3))
    # stance feet also provide yaw friction torque: shed hw_z directly
    tau_yaw = jnp.where(ok, -hw_shed * ps.hw[2] / jnp.maximum(
        hw_compliance, 1e-3), 0.0)
    tau_grf = tau_grf.at[2].add(tau_yaw)
    tau = hw_compliance * tau_grf + ext_torque

    return PlantState(
        com_pos=ps.com_pos + dt * ps.com_vel,
        com_vel=ps.com_vel + dt * acc,
        hw=ps.hw + dt * tau,
    )
