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
* angular momentum integrates the MPC's contact-vertex torques about the
  plant CoM (feet assumed to track their commanded swing trajectories).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cmpc_tpu.models import centroidal as cm

# ID-layer CoM task gains (inverse_dynamics.py:43-44)
COM_POS_GAIN = 5.0
COM_VEL_GAIN = 10.0


class PlantState(NamedTuple):
    com_pos: jnp.ndarray  # (3,)
    com_vel: jnp.ndarray  # (3,)
    hw: jnp.ndarray       # (3,)


def plant_step(ps: PlantState, com_des_pos, com_des_vel, com_des_acc,
               u0, gamma_l, gamma_r, pose_l, pose_r,
               mpc_mass, plant_mass, ext_force, ext_torque, g, polygon, dt
               ) -> PlantState:
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

    forces_l = u0[0:12].reshape(4, 3)
    forces_r = u0[12:24].reshape(4, 3)
    verts_l = cm.foot_vertices(pose_l[3:6], pose_l[2], polygon)
    verts_r = cm.foot_vertices(pose_r[3:6], pose_r[2], polygon)
    tau = (gamma_l * jnp.cross(verts_l - ps.com_pos, forces_l).sum(0)
           + gamma_r * jnp.cross(verts_r - ps.com_pos, forces_r).sum(0)
           + ext_torque)

    return PlantState(
        com_pos=ps.com_pos + dt * ps.com_vel,
        com_vel=ps.com_vel + dt * acc,
        hw=ps.hw + dt * tau,
    )
