"""Whole-body state estimation from the articulated model.

The functional equivalent of Hrp4Controller.retrieve_state
(simulation.py:303-388), computed from our rigid-body layer instead of
DART queries.  Returns a flat pytree (not nested dicts) so it scans/vmaps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cmpc_tpu.rbd import algorithms as rbd
from cmpc_tpu.rbd.urdf import RobotModel
from cmpc_tpu.utils.rotations import matrix_to_rotvec


class WBState(NamedTuple):
    """Measured whole-body quantities, reference layout ([ang, pos] poses,
    [omega, v] spatial velocities)."""

    pose_l: jnp.ndarray     # (6,) [rotvec(3), pos(3)] of l_sole
    vel_l: jnp.ndarray      # (6,) [omega(3), v(3)]
    pose_r: jnp.ndarray     # (6,)
    vel_r: jnp.ndarray      # (6,)
    com_pos: jnp.ndarray    # (3,)
    com_vel: jnp.ndarray    # (3,)
    torso_rotvec: jnp.ndarray  # (3,)
    torso_omega: jnp.ndarray   # (3,)
    base_rotvec: jnp.ndarray   # (3,)
    base_omega: jnp.ndarray    # (3,)
    joint_pos: jnp.ndarray  # (nj,)
    joint_vel: jnp.ndarray  # (nj,)
    hw: jnp.ndarray         # (3,) centroidal angular momentum


def zmp_estimate(contact_points, contact_forces, com_pos, l_foot_pos,
                 total_mass, g: float, h: float, prev_zmp=None):
    """Zero-moment-point estimate from contact forces — the functional
    mirror of Hrp4Controller.retrieve_state's ZMP block
    (simulation.py:328-348), including its quirks:

    * zmp_z = com_z - Fz / (m g / h) (the LIP normalization);
    * per-contact terms are skipped when the contact's fz <= 0.1 N;
    * if the total fz <= 0.1 N the estimate is zeroed (contact lost; the
      reference notes it should return the previous measurement — pass
      prev_zmp to get that fixed behavior);
    * the result is clipped to +-0.3 m around the reference's "midpoint",
      which is (l_foot + l_foot)/2 == l_foot — the reference's own bug,
      reproduced so traces are comparable (simulation.py:345-348).

    contact_points/contact_forces: (C, 3) arrays; inactive slots must carry
    zero force.  Fully jittable (masked, fixed C).
    """
    fz = contact_forces[:, 2]
    f_tot = contact_forces.sum(0)
    fz_tot = f_tot[2]
    safe_fz = jnp.where(jnp.abs(fz_tot) > 1e-9, fz_tot, 1.0)

    zmp_z = com_pos[2] - fz_tot / (total_mass * g / h)
    active = fz > 0.1
    num_xy = (contact_points[:, :2] * fz[:, None]
              + (zmp_z - contact_points[:, 2])[:, None]
              * contact_forces[:, :2])
    zmp_xy = jnp.sum(jnp.where(active[:, None], num_xy, 0.0), 0) / safe_fz
    zmp = jnp.concatenate([zmp_xy, zmp_z[None]])

    mid = l_foot_pos  # (l_foot + l_foot)/2, simulation.py:345
    zmp = jnp.clip(zmp, mid - 0.3, mid + 0.3)
    fallback = jnp.zeros(3) if prev_zmp is None else prev_zmp
    return jnp.where(fz_tot > 0.1, zmp, fallback)


def retrieve_state(model: RobotModel, q: rbd.RobotQ, qv) -> WBState:
    f = rbd.fk(model, q)
    Rl, pl = rbd.site_pose(model, f, "l_sole")
    Rr, pr = rbd.site_pose(model, f, "r_sole")
    om_l, v_l = rbd.site_velocity(model, f, qv, "l_sole")
    om_r, v_r = rbd.site_velocity(model, f, qv, "r_sole")
    Rt, _ = rbd.site_pose(model, f, "torso")
    om_t, _ = rbd.site_velocity(model, f, qv, "torso")
    hw, _ = rbd.centroidal_momentum(model, f, qv)
    vel = rbd.velocities(model, f, qv)
    com_vel = (jnp.einsum("b,bi->i", jnp.asarray(model.mass), vel.v_com)
               / model.total_mass)
    return WBState(
        pose_l=jnp.concatenate([matrix_to_rotvec(Rl), pl]),
        vel_l=jnp.concatenate([om_l, v_l]),
        pose_r=jnp.concatenate([matrix_to_rotvec(Rr), pr]),
        vel_r=jnp.concatenate([om_r, v_r]),
        com_pos=rbd.com(model, f),
        com_vel=com_vel,
        torso_rotvec=matrix_to_rotvec(Rt),
        torso_omega=om_t,
        base_rotvec=matrix_to_rotvec(q.base_rot),
        base_omega=qv[0:3],
        joint_pos=q.qj,
        joint_vel=qv[6:],
        hw=hw)
