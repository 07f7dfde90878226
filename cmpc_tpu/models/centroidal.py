"""Adaptive nonlinear centroidal dynamics (the paper's model).

Pure functions of arrays — the TPU-native replacement for the CasADi
expression graph built in centroidal_mpc_vertices.py:371-461
(`centroidal_dynamic`).  State and input layouts match the reference
exactly so traces are comparable:

state x (20,):  [p_com(3), v_com(3), h_w(3), theta_hat(3),
                 psi_L(1), p_L(3), psi_R(1), p_R(3)]
input u (32,):  [f_1L..f_4L (12), f_1R..f_4R (12), v_L(3), v_R(3),
                 omega_L(1), omega_R(1)]

Reference quirks kept on purpose (SURVEY.md §7 #4 — they are load-bearing
for parity):
* theta_hat is multiplied by zero in the force balance (line 453) but kept
  alive through the adaptation law theta_hat_dot = z2/m (line 459) and the
  nominal control u_n (line 208);
* foot kinematics freeze when the contact gate is active (lines 455-458).
"""

from __future__ import annotations

import jax.numpy as jnp

# slices of the state vector
P_COM = slice(0, 3)
V_COM = slice(3, 6)
H_W = slice(6, 9)
THETA = slice(9, 12)
PSI_L = 12
POS_L = slice(13, 16)
PSI_R = 16
POS_R = slice(17, 20)

N_X = 20
N_U = 32


def foot_polygon(foot_length: float = 0.25, foot_width: float = 0.13):
    """Vertex offsets of the contact polygon in the foot frame
    (centroidal_mpc_vertices.py:51-60)."""
    hl, hw = foot_length / 2.0, foot_width / 2.0
    return jnp.asarray([[hl, hw, 0.0], [hl, -hw, 0.0],
                        [-hl, -hw, 0.0], [-hl, hw, 0.0]])


def foot_vertices(pos, yaw, polygon):
    """World positions of the 4 contact vertices: R_z(yaw) @ v + pos.
    pos (..., 3), yaw (...,) -> (..., 4, 3)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    vx, vy, vz = polygon[..., 0], polygon[..., 1], polygon[..., 2]
    wx = c[..., None] * vx - s[..., None] * vy
    wy = s[..., None] * vx + c[..., None] * vy
    wz = jnp.broadcast_to(vz, wx.shape)
    return jnp.stack([wx, wy, wz], axis=-1) + pos[..., None, :]


def centroidal_dynamics(x, com_ref, gamma_l, gamma_r, u, k1, k2, mass, g,
                        polygon):
    """Continuous-time state derivative f(x, u) — mirrors
    centroidal_mpc_vertices.py:371-461.

    com_ref: (9,) [pos(3), vel(3), acc(3)] reference at this node (only
    pos/vel feed the adaptation law here).
    """
    p = x[P_COM]
    v = x[V_COM]
    theta = x[THETA]
    psi_l, p_l = x[PSI_L], x[POS_L]
    psi_r, p_r = x[PSI_R], x[POS_R]

    forces_l = u[0:12].reshape(4, 3)
    forces_r = u[12:24].reshape(4, 3)
    v_l = u[24:27]
    v_r = u[27:30]
    om_l = u[30]
    om_r = u[31]

    gravity = jnp.array([0.0, 0.0, -1.0]) * g

    sum_fl = forces_l.sum(0) * gamma_l
    sum_fr = forces_r.sum(0) * gamma_r

    # z2 of the backstepping change of coordinates (lines 408-409)
    z1 = p - com_ref[0:3]
    z2 = k1 * z1 + (v - com_ref[3:6])

    # angular momentum: sum over contact vertices of (p_v - p) x f_v
    verts_l = foot_vertices(p_l, psi_l, polygon)       # (4, 3)
    verts_r = foot_vertices(p_r, psi_r, polygon)
    tau_l = gamma_l * jnp.cross(verts_l - p, forces_l).sum(0)
    tau_r = gamma_r * jnp.cross(verts_r - p, forces_r).sum(0)

    dp = v
    # theta_hat * 0: the reference disables the estimate in the force
    # balance (line 453) — reproduced bit-for-bit.
    dv = gravity + (sum_fl + sum_fr + theta * 0.0) / mass
    dhw = tau_l + tau_r
    dtheta = z2 / mass
    dpsi_l = (1.0 - gamma_l) * om_l
    dp_l = (1.0 - gamma_l) * v_l
    dpsi_r = (1.0 - gamma_r) * om_r
    dp_r = (1.0 - gamma_r) * v_r

    return jnp.concatenate([
        dp, dv, dhw, dtheta,
        dpsi_l[None], dp_l, dpsi_r[None], dp_r,
    ])


def euler_step(x, com_ref, gamma_l, gamma_r, u, k1, k2, mass, g, polygon,
               delta):
    """Explicit-Euler discretization used by both the MPC transcription and
    the centroidal plant (centroidal_mpc_vertices.py:187-190)."""
    return x + delta * centroidal_dynamics(x, com_ref, gamma_l, gamma_r, u,
                                           k1, k2, mass, g, polygon)
