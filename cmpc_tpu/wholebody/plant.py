"""Whole-body physics plant: articulated forward dynamics + ground contact.

The TPU-native stand-in for DART's rigid-body world (simulation.py:400-433:
10 ms steps, gravity -9.81, collision solve against a flat ground).
Contact points are the 4 corners of each sole polygon (the same
0.25 x 0.13 m footprint the MPC uses).

Two contact models, selected per step:

* ``impulse`` (default) — velocity-level rigid contact, the regime DART's
  LCP solver provides and the whole-body ID QP *assumes*: per substep,
  contact impulses solve the complementarity problem on the Delassus
  operator G = J M^-1 J^T with a fixed-count projected-Jacobi iteration
  (normal impulses >= 0 with Baumgarte push-out, friction impulses in the
  Coulomb box).  Branch-free, batched, and stiff-stable at 2-10 substeps
  per 10 ms tick.  A penalty ground cannot play this role: the ID QP
  decides contact forces assuming the ground supplies them instantly;
  springs supply force only after penetration builds, and the 40 kg robot
  falls through the gap (observed: commanded 575 N, spring delivered
  ~400 N, the knees folded).
* ``penalty`` — smooth spring-damper corners, useful for gradient-based
  work (fully differentiable, no complementarity kinks).

This is an evaluation-fidelity plant: it reproduces stance support,
payload loading and push responses well enough to exercise the full
planner -> MPC -> ID -> torques pipeline end to end on device; it is not
a maximal-coordinate LCP solver with restitution and rolling friction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cmpc_tpu.rbd import algorithms as rbd
from cmpc_tpu.rbd.algorithms import _highp
from cmpc_tpu.rbd.urdf import RobotModel


class ContactParams(NamedTuple):
    # impulse model
    pgs_iters: int = 15      # projected Gauss-Seidel sweeps per substep
    relax: float = 1.0       # GS relaxation (1 = plain Gauss-Seidel)
    baumgarte: float = 0.2   # penetration push-out gain (per substep)
    slop: float = 1e-4       # penetration tolerance (m)
    cfm: float = 1e-3        # constraint-force mixing (diagonal compliance)
    # penalty model
    kn: float = 4.0e4        # normal stiffness (N/m)
    dn: float = 2.0e3        # normal damping (N s/m)
    kt: float = 2.0e3        # tangential viscous gain (N s/m)
    mu: float = 0.5          # Coulomb friction (both models)


class WBPlantState(NamedTuple):
    q: rbd.RobotQ
    qv: jnp.ndarray


def foot_corner_offsets(foot_length: float = 0.25, foot_width: float = 0.13):
    hl, hw = foot_length / 2.0, foot_width / 2.0
    return jnp.asarray([[hl, hw, 0.0], [hl, -hw, 0.0],
                        [-hl, -hw, 0.0], [-hl, hw, 0.0]])


@_highp
def _corner_points(model, f, corners):
    """(8,3) world corner points and their (8,3,nv) linear Jacobians."""
    pts = []
    Js = []
    for site in ("l_sole", "r_sole"):
        R, p = rbd.site_pose(model, f, site)
        idx, _ = model.sites[site]
        world = p + (R @ corners.T).T                    # (4,3)
        for k in range(4):
            pts.append(world[k])
            Js.append(rbd.point_jacobian(model, f, idx, world[k])[3:6])
    return jnp.stack(pts), jnp.stack(Js)


@_highp
def _impulse_substep(model, q, qv, tau, ext_wrench, corners,
                     cp: ContactParams, g: float, h: float):
    f = rbd.fk(model, q)
    M = rbd.mass_matrix(model, f)
    bias = rbd.bias_forces(model, f, qv, g)
    rhs = -bias
    rhs = rhs.at[6:].add(tau)
    Jb = rbd.point_jacobian(model, f, 0, f.p[0])
    rhs = rhs + Jb.T @ ext_wrench
    Minv_rhs = jnp.linalg.solve(M + 1e-9 * jnp.eye(model.nv), rhs)
    v_free = qv + h * Minv_rhs

    pts, Jc = _corner_points(model, f, corners)          # (8,3),(8,3,nv)
    J = Jc.reshape(24, model.nv)
    MinvJt = jnp.linalg.solve(M + 1e-9 * jnp.eye(model.nv), J.T)
    G = J @ MinvJt                                       # (24,24) Delassus

    pen = -pts[:, 2]                                     # (8,)
    active = (pen > -cp.slop).astype(qv.dtype)
    v0 = J @ v_free                                      # (24,)
    # desired outward normal velocity (Baumgarte push-out)
    b = jnp.zeros(24).at[2::3].set(
        cp.baumgarte * jnp.maximum(pen, 0.0) / h)

    D = jnp.diag(G) + cp.cfm

    # Projected Gauss-Seidel: sequential per-row updates.  Jacobi-style
    # parallel sweeps DIVERGE here — the 8 corners ride one near-rigid
    # body, so G's off-diagonals match its diagonal and the parallel
    # update oscillates with period 2 (observed: lambda -> 0 every even
    # sweep while the robot fell through the floor).
    def contact_update(k, lam):
        i = 3 * k
        gn = G[i + 2] @ lam + v0[i + 2] - b[i + 2]
        ln = (jnp.maximum(lam[i + 2] - cp.relax * gn / D[i + 2], 0.0)
              * active[k])
        lam = lam.at[i + 2].set(ln)
        cap = cp.mu * ln
        gx = G[i] @ lam + v0[i]
        lam = lam.at[i].set(jnp.clip(lam[i] - cp.relax * gx / D[i],
                                     -cap, cap))
        gy = G[i + 1] @ lam + v0[i + 1]
        lam = lam.at[i + 1].set(jnp.clip(lam[i + 1]
                                         - cp.relax * gy / D[i + 1],
                                         -cap, cap))
        return lam

    def sweep(_, lam):
        return jax.lax.fori_loop(0, 8, contact_update, lam)

    lam = jax.lax.fori_loop(0, cp.pgs_iters, sweep, jnp.zeros(24))
    qv_new = v_free + MinvJt @ lam
    # impulses -> average forces over the substep (for ZMP estimation,
    # simulation.py:328-348's per-contact force source)
    return q, qv_new, pts, lam.reshape(8, 3) / h


def wb_plant_step(model: RobotModel, state: WBPlantState, tau,
                  ext_force=None, ext_torque=None,
                  dt: float = 0.01, substeps: int = 5,
                  g: float = 9.81,
                  cp: ContactParams = ContactParams(),
                  foot_length: float = 0.25, foot_width: float = 0.13,
                  contact_model: str = "impulse",
                  return_contacts: bool = False):
    """One control tick: hold tau constant, integrate `substeps` physics
    steps.  ext_force/ext_torque: world wrench on the base (the
    disturbance-injection hook, simulation.py:195-198).

    return_contacts=True additionally returns the final substep's contact
    points and forces ((8,3) each) — the ZMP-estimation source
    (simulation.py:328-348)."""
    corners = foot_corner_offsets(foot_length, foot_width)
    h = dt / substeps
    ext_f = jnp.zeros(3) if ext_force is None else ext_force
    ext_t = jnp.zeros(3) if ext_torque is None else ext_torque
    ext_wrench = jnp.concatenate([ext_t, ext_f])

    if contact_model == "impulse":
        def substep(carry, _):
            q, qv = carry
            _, qv_new, pts, f_c = _impulse_substep(
                model, q, qv, tau, ext_wrench, corners, cp, g, h)
            q_new = _integrate_q(q, qv_new, h)
            return (q_new, qv_new), (pts, f_c)
    elif contact_model == "penalty":
        def substep(carry, _):
            q, qv = carry
            qdd = _penalty_qdd(model, q, qv, tau, ext_wrench, corners,
                               cp, g)
            q_new, qv_new = rbd.integrate(q, qv, qdd, h)
            return (q_new, qv_new), (jnp.zeros((8, 3)), jnp.zeros((8, 3)))
    else:
        raise ValueError(contact_model)

    (q, qv), (pts, f_c) = jax.lax.scan(substep, (state.q, state.qv), None,
                                       length=substeps)
    if return_contacts:
        return WBPlantState(q=q, qv=qv), (pts[-1], f_c[-1])
    return WBPlantState(q=q, qv=qv)


def _integrate_q(q: rbd.RobotQ, qv, h: float) -> rbd.RobotQ:
    from cmpc_tpu.utils.rotations import rotvec_to_matrix
    dR = rotvec_to_matrix(qv[0:3] * h)
    return rbd.RobotQ(base_pos=q.base_pos + h * qv[3:6],
                      base_rot=dR @ q.base_rot,
                      qj=q.qj + h * qv[6:])


@_highp
def _penalty_qdd(model, q, qv, tau, ext_wrench, corners, cp: ContactParams,
                 g: float):
    f = rbd.fk(model, q)
    wl = _sole_contact_wrench(model, f, qv, "l_sole", corners, cp)
    wr = _sole_contact_wrench(model, f, qv, "r_sole", corners, cp)
    M = rbd.mass_matrix(model, f)
    bias = rbd.bias_forces(model, f, qv, g)
    rhs = -bias
    rhs = rhs.at[6:].add(tau)
    Jl = rbd.site_jacobian(model, f, "l_sole")
    Jr = rbd.site_jacobian(model, f, "r_sole")
    rhs = rhs + Jl.T @ wl + Jr.T @ wr
    Jb = rbd.point_jacobian(model, f, 0, f.p[0])
    rhs = rhs + Jb.T @ ext_wrench
    return jnp.linalg.solve(M + 1e-9 * jnp.eye(model.nv), rhs)


@_highp
def _sole_contact_wrench(model, f, qv, site, corners, cp: ContactParams):
    """Spring-damper ground wrench on one sole about the sole origin."""
    R, p = rbd.site_pose(model, f, site)
    omega, v = rbd.site_velocity(model, f, qv, site)
    pts = p + (R @ corners.T).T                       # (4,3) world corners
    vels = v + jnp.cross(omega, pts - p)              # (4,3)
    pen = -pts[:, 2]
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
