"""Whole-body physics plant: articulated forward dynamics + ground contact.

The TPU-native stand-in for DART's rigid-body world (simulation.py:400-433:
10 ms steps, gravity -9.81, collision solve against a flat ground).  Contact
is a regularized penalty model at the 4 corner points of each sole polygon
(the same 0.25 x 0.13 m footprint the MPC uses) — normal spring-damper with
unilateral clamping plus Coulomb-clamped tangential viscous friction — which
makes the whole plant step a smooth, branch-free, vmappable function.
A control tick integrates `substeps` semi-implicit Euler steps.

This is an evaluation-fidelity plant: it reproduces stance support, payload
loading and push responses well enough to exercise the full
planner -> MPC -> ID -> torques pipeline end to end on device; it is not a
maximal-coordinate LCP solver like DART's.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cmpc_tpu.rbd import algorithms as rbd
from cmpc_tpu.rbd.urdf import RobotModel


class ContactParams(NamedTuple):
    kn: float = 4.0e4       # normal stiffness (N/m)
    dn: float = 2.0e3       # normal damping (N s/m)
    kt: float = 2.0e3       # tangential viscous gain (N s/m)
    mu: float = 0.5         # Coulomb friction


class WBPlantState(NamedTuple):
    q: rbd.RobotQ
    qv: jnp.ndarray


def foot_corner_offsets(foot_length: float = 0.25, foot_width: float = 0.13):
    hl, hw = foot_length / 2.0, foot_width / 2.0
    return jnp.asarray([[hl, hw, 0.0], [hl, -hw, 0.0],
                        [-hl, -hw, 0.0], [-hl, hw, 0.0]])


def _sole_contact_wrench(R, p, omega, v, corners, cp: ContactParams):
    """Ground wrench on one sole: sum of 4 corner-point penalty forces,
    reduced to a [torque, force] wrench about the sole origin."""
    pts = p + (R @ corners.T).T                       # (4,3) world corners
    vels = v + jnp.cross(omega, pts - p)              # (4,3)
    pen = -pts[:, 2]                                  # penetration depth
    active = pen > 0.0
    fz = jnp.where(active,
                   jnp.maximum(cp.kn * pen - cp.dn * vels[:, 2], 0.0), 0.0)
    ft = -cp.kt * vels[:, 0:2]
    ft_norm = jnp.linalg.norm(ft, axis=1, keepdims=True)
    scale = jnp.minimum(1.0, cp.mu * fz[:, None]
                        / jnp.maximum(ft_norm, 1e-9))
    ft = ft * scale * active[:, None]
    forces = jnp.concatenate([ft, fz[:, None]], axis=1)  # (4,3)
    torque = jnp.sum(jnp.cross(pts - p, forces), axis=0)
    return jnp.concatenate([torque, jnp.sum(forces, axis=0)])


def wb_plant_step(model: RobotModel, state: WBPlantState, tau,
                  ext_force=None, ext_torque=None,
                  dt: float = 0.01, substeps: int = 10,
                  g: float = 9.81,
                  cp: ContactParams = ContactParams(),
                  foot_length: float = 0.25, foot_width: float = 0.13):
    """One control tick: hold tau constant, integrate `substeps` physics
    steps.  ext_force/ext_torque: world wrench on the base (the
    disturbance-injection hook, simulation.py:195-198)."""
    corners = foot_corner_offsets(foot_length, foot_width)
    h = dt / substeps
    ext_f = jnp.zeros(3) if ext_force is None else ext_force
    ext_t = jnp.zeros(3) if ext_torque is None else ext_torque

    def substep(carry, _):
        q, qv = carry
        f = rbd.fk(model, q)
        Rl, pl = rbd.site_pose(model, f, "l_sole")
        Rr, pr = rbd.site_pose(model, f, "r_sole")
        om_l, v_l = rbd.site_velocity(model, f, qv, "l_sole")
        om_r, v_r = rbd.site_velocity(model, f, qv, "r_sole")
        wl = _sole_contact_wrench(Rl, pl, om_l, v_l, corners, cp)
        wr = _sole_contact_wrench(Rr, pr, om_r, v_r, corners, cp)

        M = rbd.mass_matrix(model, f)
        bias = rbd.bias_forces(model, f, qv, g)
        rhs = -bias
        rhs = rhs.at[6:].add(tau)
        Jl = rbd.site_jacobian(model, f, "l_sole")
        Jr = rbd.site_jacobian(model, f, "r_sole")
        rhs = rhs + Jl.T @ wl + Jr.T @ wr
        # disturbance wrench on the base body origin
        Jb = rbd.point_jacobian(model, f, 0, f.p[0])
        rhs = rhs + Jb.T @ jnp.concatenate([ext_t, ext_f])
        qdd = jnp.linalg.solve(M + 1e-9 * jnp.eye(model.nv), rhs)
        q, qv = rbd.integrate(q, qv, qdd, h)
        return (q, qv), None

    (q, qv), _ = jax.lax.scan(substep, (state.q, state.qv), None,
                              length=substeps)
    return WBPlantState(q=q, qv=qv)
