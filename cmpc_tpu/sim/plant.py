"""Centroidal plant for closed-loop evaluation.

The reference closes its loop against DART whole-body physics
(simulation.py:193-301).  Porting DART is an explicit non-goal
(SURVEY.md §7): evaluation parity is at the centroidal/controller level.
This plant integrates the same centroidal mechanics as the MPC model but
with *plant-side truth*: the true mass (payload scenarios), external push
wrenches (the reference's addExtForce window, simulation.py:195-198), and
the swing-foot poses actually commanded — so model mismatch and
disturbances exercise the adaptive/stability machinery exactly where the
reference's scenarios do.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cmpc_tpu.models import centroidal as cm


class PlantState(NamedTuple):
    com_pos: jnp.ndarray  # (3,)
    com_vel: jnp.ndarray  # (3,)
    hw: jnp.ndarray       # (3,)


def plant_step(ps: PlantState, u0, gamma_l, gamma_r, pose_l, pose_r,
               plant_mass, ext_force, ext_torque, g, polygon, dt
               ) -> PlantState:
    """One Euler step of the plant under the MPC's stage-0 input.

    pose_l / pose_r: [ang(3), pos(3)] actual foot poses (kinematic
    tracking of the commanded swing trajectories is assumed).
    """
    forces_l = u0[0:12].reshape(4, 3)
    forces_r = u0[12:24].reshape(4, 3)
    sum_f = forces_l.sum(0) * gamma_l + forces_r.sum(0) * gamma_r

    gravity = jnp.array([0.0, 0.0, -1.0]) * g
    acc = gravity + (sum_f + ext_force) / plant_mass

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
