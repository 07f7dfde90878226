"""Rigid-body kinematics & dynamics algorithms, pure JAX.

The TPU-native replacement for the DART C++ queries the reference's
whole-body layer depends on (inverse_dynamics.py:47-65 Jacobians,
:112 mass matrix, :116 Coriolis+gravity; simulation.py:303-388 state
estimation incl. CoM and centroidal angular momentum).

Everything is a pure function of (RobotModel constants, q, qv) built from
dense per-body world Jacobians:

    M(q)  = sum_b J_b^T diag(I_b^w, m_b 1) J_b          (mass matrix)
    h(q,qv) = sum_b J_b^T [I a_bias + w x (I w); m a_com_bias]
              - sum_b J_lin,b^T m g                      (Coriolis+gravity)

with J_b the 6 x nv [angular; linear-at-com] Jacobian.  At HRP-4 size
(25 bodies, nv=30) this O(nb * nv^2) formulation is a handful of small
matmuls — it vectorizes over bodies, batches under vmap, and avoids the
sequential chained dependencies of the O(n) recursions (CRBA/ABA) that
serialize poorly on wide hardware.  The tree itself is static: the FK
recursion unrolls at trace time into a fixed op graph.

Conventions:
  q  = RobotQ(base_pos(3), base_rot(3,3), qj(nj))
  qv = (6+nj,) = [omega_base_world(3), v_base_origin_world(3), qdot(nj)]
(angular-first, matching DART's FreeJoint spatial ordering so logged
traces compare directly with the reference.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cmpc_tpu.rbd.urdf import RobotModel
from cmpc_tpu.utils.rotations import hat, rotvec_to_matrix


def _highp(fn):
    """Force true-f32 matmuls inside `fn`.

    On TPU the default matmul precision demotes f32 operands to bf16
    multiplies.  Kinematics cannot tolerate that: FK composes ~25 rotation
    matrices in a chain (bf16 => ~1e-2 orientation error at the feet), and
    the resulting noise in M/h/Jacobians destabilized the whole-body
    closed loop on TPU while the identical f32 program was stable on CPU.
    These are 3x3 / 30x30 products — HIGHEST precision costs nothing
    measurable here."""
    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)
    return wrapped


class RobotQ(NamedTuple):
    """Configuration. base_rot is a world-from-base rotation matrix (the
    9-number representation keeps FK linear-algebra-only; integrators
    re-orthonormalize via the exp map)."""

    base_pos: jnp.ndarray   # (3,)
    base_rot: jnp.ndarray   # (3,3)
    qj: jnp.ndarray         # (nj,)


class FK(NamedTuple):
    """World-frame kinematics of every movable body."""

    R: jnp.ndarray          # (nb,3,3) world-from-body rotations
    p: jnp.ndarray          # (nb,3) body-frame origins (joint origins)
    axis_w: jnp.ndarray     # (nb,3) world joint axes
    com_w: jnp.ndarray      # (nb,3) world body-com positions
    I_w: jnp.ndarray        # (nb,3,3) world-axes inertia about body com


def neutral_q(model: RobotModel) -> RobotQ:
    return RobotQ(base_pos=jnp.zeros(3), base_rot=jnp.eye(3),
                  qj=jnp.zeros(model.nj))


def _axis_angle(axis, theta):
    """Rodrigues for a fixed unit axis (cheaper than generic rotvec)."""
    K = hat(axis)
    return (jnp.eye(3) + jnp.sin(theta) * K
            + (1.0 - jnp.cos(theta)) * (K @ K))


@_highp
def fk(model: RobotModel, q: RobotQ) -> FK:
    """Forward kinematics over the static tree (unrolled at trace time)."""
    T_tree = jnp.asarray(model.T_tree)
    axes = jnp.asarray(model.axis)
    coms = jnp.asarray(model.com)
    inertias = jnp.asarray(model.inertia)

    Rs = [q.base_rot]
    ps = [q.base_pos]
    axis_w = [q.base_rot @ axes[0]]
    for i in range(1, model.nb):
        par = int(model.parent[i])
        Rp, pp = Rs[par], ps[par]
        Rj = Rp @ T_tree[i, :3, :3]
        pj = pp + Rp @ T_tree[i, :3, 3]
        Ri = Rj @ _axis_angle(axes[i], q.qj[i - 1])
        Rs.append(Ri)
        ps.append(pj)
        axis_w.append(Rj @ axes[i])

    R = jnp.stack(Rs)
    p = jnp.stack(ps)
    com_w = p + jnp.einsum("bij,bj->bi", R, coms)
    I_w = jnp.einsum("bij,bjk,blk->bil", R, inertias, R)
    return FK(R=R, p=p, axis_w=jnp.stack(axis_w), com_w=com_w, I_w=I_w)


@_highp
def point_jacobian(model: RobotModel, f: FK, body_idx: int, point_w):
    """6 x nv world Jacobian [angular; linear] of a point rigidly attached
    to body body_idx (static index). Matches DART's
    getJacobian(inCoordinatesOf=World) up to the frame offset."""
    nv = model.nv
    anc = jnp.asarray(model.ancestor[body_idx, 1:], dtype=f.p.dtype)  # (nj,)
    Jang = jnp.zeros((3, nv))
    Jang = Jang.at[:, 0:3].set(jnp.eye(3))
    Jang = Jang.at[:, 6:].set(f.axis_w[1:].T * anc)
    r = point_w - f.p[0]
    arm = point_w - f.p[1:]                                  # (nj,3)
    Jlin = jnp.zeros((3, nv))
    Jlin = Jlin.at[:, 0:3].set(-hat(r))
    Jlin = Jlin.at[:, 3:6].set(jnp.eye(3))
    Jlin = Jlin.at[:, 6:].set(jnp.cross(f.axis_w[1:], arm).T * anc)
    return jnp.concatenate([Jang, Jlin], axis=0)


@_highp
def _body_com_jacobians(model: RobotModel, f: FK):
    """(nb, 6, nv) stacked [angular; linear-at-com] Jacobians of every
    movable body — the common factor of M, h, and the centroidal maps."""
    nv = model.nv
    nb = model.nb
    anc = jnp.asarray(model.ancestor[:, 1:], dtype=f.p.dtype)  # (nb,nj)

    Jang = jnp.zeros((nb, 3, nv))
    Jang = Jang.at[:, :, 0:3].set(jnp.eye(3))
    # column j moves body b iff joint j is an ancestor of b
    Jang = Jang.at[:, :, 6:].set(
        jnp.einsum("jc,bj->bcj", f.axis_w[1:], anc))

    arm_base = f.com_w - f.p[0]                               # (nb,3)
    arm = f.com_w[:, None, :] - f.p[None, 1:, :]              # (nb,nj,3)
    lin_j = jnp.cross(jnp.broadcast_to(f.axis_w[1:],
                                       arm.shape), arm)       # (nb,nj,3)
    Jlin = jnp.zeros((nb, 3, nv))
    Jlin = Jlin.at[:, :, 0:3].set(-hat(arm_base))
    Jlin = Jlin.at[:, :, 3:6].set(jnp.eye(3))
    Jlin = Jlin.at[:, :, 6:].set(
        jnp.einsum("bjc,bj->bcj", lin_j, anc))
    return jnp.concatenate([Jang, Jlin], axis=1)


@_highp
def mass_matrix(model: RobotModel, f: FK):
    """Joint-space inertia matrix M(q), (nv, nv). DART: getMassMatrix()."""
    J = _body_com_jacobians(model, f)                         # (nb,6,nv)
    m = jnp.asarray(model.mass)
    IJ_ang = jnp.einsum("bij,bjv->biv", f.I_w, J[:, 0:3])     # (nb,3,nv)
    IJ_lin = m[:, None, None] * J[:, 3:6]
    IJ = jnp.concatenate([IJ_ang, IJ_lin], axis=1)
    M = jnp.einsum("bcv,bcw->vw", J, IJ)
    return 0.5 * (M + M.T)


class Vel(NamedTuple):
    omega: jnp.ndarray      # (nb,3) world angular velocities
    v_origin: jnp.ndarray   # (nb,3) world velocity of body-frame origins
    v_com: jnp.ndarray      # (nb,3)


@_highp
def velocities(model: RobotModel, f: FK, qv) -> Vel:
    """Propagate body velocities down the static tree."""
    om = [qv[0:3]]
    vo = [qv[3:6]]
    for i in range(1, model.nb):
        par = int(model.parent[i])
        r = f.p[i] - f.p[par]
        om.append(om[par] + qv[6 + i - 1] * f.axis_w[i])
        vo.append(vo[par] + jnp.cross(om[par], r))
    omega = jnp.stack(om)
    v_origin = jnp.stack(vo)
    v_com = v_origin + jnp.cross(omega, f.com_w - f.p)
    return Vel(omega=omega, v_origin=v_origin, v_com=v_com)


class BiasAcc(NamedTuple):
    """Body accelerations with qdd = 0 — i.e. Jdot(q) qv per body."""

    alpha: jnp.ndarray      # (nb,3) angular
    a_origin: jnp.ndarray   # (nb,3) classical acceleration of body origins


@_highp
def bias_accelerations(model: RobotModel, f: FK, vel: Vel, qv) -> BiasAcc:
    """Propagate qdd=0 (velocity-product) accelerations down the tree."""
    al = [jnp.zeros(3)]
    ao = [jnp.zeros(3)]
    for i in range(1, model.nb):
        par = int(model.parent[i])
        r = f.p[i] - f.p[par]
        al.append(al[par] + jnp.cross(vel.omega[par],
                                      qv[6 + i - 1] * f.axis_w[i]))
        ao.append(ao[par] + jnp.cross(al[par], r)
                  + jnp.cross(vel.omega[par],
                              jnp.cross(vel.omega[par], r)))
    return BiasAcc(alpha=jnp.stack(al), a_origin=jnp.stack(ao))


@_highp
def site_bias_acc(model: RobotModel, f: FK, vel: Vel, bias: BiasAcc,
                  site: str):
    """(alpha(3), a(3)) of a named site with qdd = 0: the Jdot qv terms the
    ID tasks need (DART getJacobianClassicDeriv @ qv)."""
    idx, T_off = model.sites[site]
    p_site = f.p[idx] + f.R[idx] @ jnp.asarray(T_off)[:3, 3]
    r = p_site - f.p[idx]
    a = (bias.a_origin[idx] + jnp.cross(bias.alpha[idx], r)
         + jnp.cross(vel.omega[idx], jnp.cross(vel.omega[idx], r)))
    return bias.alpha[idx], a


@_highp
def com_bias_acc(model: RobotModel, f: FK, vel: Vel, bias: BiasAcc):
    """CoM linear acceleration with qdd = 0 (DART
    getCOMLinearJacobianDeriv @ qv)."""
    c_arm = f.com_w - f.p
    a_com = (bias.a_origin + jnp.cross(bias.alpha, c_arm)
             + jnp.cross(vel.omega, jnp.cross(vel.omega, c_arm)))
    m = jnp.asarray(model.mass)
    return jnp.einsum("b,bi->i", m, a_com) / model.total_mass


@_highp
def bias_forces(model: RobotModel, f: FK, qv, g: float = 9.81):
    """Coriolis + centrifugal + gravity generalized forces h(q, qv),
    (nv,). DART: getCoriolisAndGravityForces()."""
    vel = velocities(model, f, qv)
    bias = bias_accelerations(model, f, vel, qv)
    alpha, a_origin = bias.alpha, bias.a_origin
    c_arm = f.com_w - f.p
    a_com = (a_origin + jnp.cross(alpha, c_arm)
             + jnp.cross(vel.omega, jnp.cross(vel.omega, c_arm)))

    m = jnp.asarray(model.mass)
    g_vec = jnp.array([0.0, 0.0, -g])
    tau_b = (jnp.einsum("bij,bj->bi", f.I_w, alpha)
             + jnp.cross(vel.omega, jnp.einsum("bij,bj->bi", f.I_w,
                                               vel.omega)))
    f_b = m[:, None] * (a_com - g_vec)
    J = _body_com_jacobians(model, f)
    wrench = jnp.concatenate([tau_b, f_b], axis=1)            # (nb,6)
    return jnp.einsum("bcv,bc->v", J, wrench)


@_highp
def com(model: RobotModel, f: FK):
    """Whole-robot CoM (3,). DART: getCOM()."""
    m = jnp.asarray(model.mass)
    return jnp.einsum("b,bi->i", m, f.com_w) / model.total_mass


@_highp
def com_jacobian(model: RobotModel, f: FK):
    """3 x nv linear CoM Jacobian. DART: getCOMLinearJacobian(World)."""
    J = _body_com_jacobians(model, f)
    m = jnp.asarray(model.mass)
    return jnp.einsum("b,bcv->cv", m, J[:, 3:6]) / model.total_mass


@_highp
def centroidal_momentum(model: RobotModel, f: FK, qv):
    """(h_w(3), h_lin(3)): angular momentum about the robot CoM and linear
    momentum — the quantity the reference estimates body-by-body in
    retrieve_state (simulation.py:353-357)."""
    vel = velocities(model, f, qv)
    m = jnp.asarray(model.mass)
    c = com(model, f)
    h_w = jnp.einsum("bij,bj->i", f.I_w, vel.omega) + jnp.sum(
        m[:, None] * jnp.cross(f.com_w - c, vel.v_com), axis=0)
    h_lin = jnp.sum(m[:, None] * vel.v_com, axis=0)
    return h_w, h_lin


@_highp
def centroidal_inertia(model: RobotModel, f: FK):
    """Composite rigid-body inertia about the robot CoM (3,3) — the
    quantity dumped to Debug/"centroidal composite rigid body inertia"."""
    c = com(model, f)
    d = f.com_w - c
    m = jnp.asarray(model.mass)
    dd = jnp.einsum("bi,bi->b", d, d)
    outer = jnp.einsum("bi,bj->bij", d, d)
    shift = m[:, None, None] * (dd[:, None, None]
                                * jnp.eye(3) - outer)
    return jnp.sum(f.I_w + shift, axis=0)


@_highp
def site_pose(model: RobotModel, f: FK, site: str):
    """World (R, p) of a named site (e.g. 'l_sole')."""
    idx, T_off = model.sites[site]
    T_off = jnp.asarray(T_off)
    R = f.R[idx] @ T_off[:3, :3]
    p = f.p[idx] + f.R[idx] @ T_off[:3, 3]
    return R, p


@_highp
def site_jacobian(model: RobotModel, f: FK, site: str):
    """6 x nv world Jacobian of a named site."""
    idx, T_off = model.sites[site]
    p = f.p[idx] + f.R[idx] @ jnp.asarray(T_off)[:3, 3]
    return point_jacobian(model, f, idx, p)


@_highp
def site_velocity(model: RobotModel, f: FK, qv, site: str):
    """(omega(3), v(3)) of a named site."""
    J = site_jacobian(model, f, site)
    sv = J @ qv
    return sv[0:3], sv[3:6]


@_highp
def forward_dynamics(model: RobotModel, q: RobotQ, qv, tau_actuated,
                     contact_wrenches=(), g: float = 9.81,
                     reg: float = 1e-9):
    """qdd = M^{-1} (S tau + sum_c J_c^T w_c - h): the plant-side solve
    DART performs each world step.  contact_wrenches: iterable of
    (site_name, wrench(6,) [torque; force] world)."""
    f = fk(model, q)
    M = mass_matrix(model, f)
    h = bias_forces(model, f, qv, g)
    rhs = -h
    rhs = rhs.at[6:].add(tau_actuated)
    for site, w in contact_wrenches:
        J = site_jacobian(model, f, site)
        rhs = rhs + J.T @ w
    return jnp.linalg.solve(M + reg * jnp.eye(model.nv), rhs)


def integrate(q: RobotQ, qv, qacc, dt: float) -> tuple:
    """Semi-implicit Euler with exp-map base-rotation update (the rotation
    matrix stays on SO(3) without re-orthonormalization drift)."""
    qv_new = qv + dt * qacc
    dR = rotvec_to_matrix(qv_new[0:3] * dt)
    return RobotQ(base_pos=q.base_pos + dt * qv_new[3:6],
                  base_rot=dR @ q.base_rot,
                  qj=q.qj + dt * qv_new[6:]), qv_new
