"""Whole-body inverse-dynamics QP — batched TPU port of
inverse_dynamics.py + utils.QPSolver.

The reference solves, per tick with OSQP, a 72-variable task-space QP over
x = [q_ddot(30), tau(30), f_c(12)]: six weighted acceleration tasks, the
floating-base dynamics equality M q_ddot + h - J_c^T f_c = S tau, and CoP /
friction inequality boxes per foot (inverse_dynamics.py:30-136).

This module takes the task matrices as inputs (Jacobians, mass matrix,
bias) — produced either by a rigid-body layer or recorded — assembles
(H, F, A_eq, A_ineq) exactly as the reference does, and solves with the
shared ADMM kernel.  It therefore batches over robots/scenarios.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_tpu.ops.admm import ADMMSettings, admm_solve

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

TASKS = ("lfoot", "rfoot", "com", "torso", "base", "joints")
# weights and PD gains (inverse_dynamics.py:42-44)
WEIGHTS = dict(lfoot=1.0, rfoot=1.0, com=1.0, torso=1.0, base=1.0,
               joints=1e-1)
POS_GAINS = dict(lfoot=10.0, rfoot=10.0, com=5.0, torso=10.0, base=10.0,
                 joints=10.0)
VEL_GAINS = dict(lfoot=5.0, rfoot=5.0, com=10.0, torso=5.0, base=3.0,
                 joints=5.0)


class IDTask(NamedTuple):
    """One task's data: Jacobian, the velocity-product term Jdot @ qv (the
    bias acceleration — cheaper to compute than the Jdot matrix itself),
    feedforward acceleration, position and velocity errors."""

    J: jnp.ndarray        # (k, n_dof)
    Jdot_qv: jnp.ndarray  # (k,)
    ff: jnp.ndarray       # (k,)
    pos_err: jnp.ndarray  # (k,)
    vel_err: jnp.ndarray  # (k,)


class IDDynamics(NamedTuple):
    M: jnp.ndarray        # (n_dof, n_dof) mass matrix
    h: jnp.ndarray        # (n_dof,) Coriolis + gravity bias
    J_lfoot: jnp.ndarray  # (6, n_dof) world-frame sole Jacobians
    J_rfoot: jnp.ndarray  # (6, n_dof)


def _cop_friction_rows(d: float, mu: float):
    """8 rows per foot over [tau_xyz, f_xyz] (inverse_dynamics.py:121-128):
    CoP box |tau_x|,|tau_y| <= d f_z and friction |f_x|,|f_y| <= mu f_z."""
    return np.array([
        [1, 0, 0, 0, 0, -d], [-1, 0, 0, 0, 0, -d],
        [0, 1, 0, 0, 0, -d], [0, -1, 0, 0, 0, -d],
        [0, 0, 0, 1, 0, -mu], [0, 0, 0, -1, 0, -mu],
        [0, 0, 0, 0, 1, -mu], [0, 0, 0, 0, -1, -mu],
    ], dtype=np.float64)


def solve_id_qp(tasks: dict, dyn: IDDynamics, qdot, contact_l, contact_r,
                n_dof: int = 30, foot_size: float = 0.1, mu: float = 0.5,
                settings: ADMMSettings = ADMMSettings(iters=100, rho=10.0),
                weights: dict | None = None, pos_gains: dict | None = None,
                vel_gains: dict | None = None):
    """Assemble and solve the ID QP; returns the 24 actuated joint torques
    (tau[6:], inverse_dynamics.py:133-136).

    tasks: {name: IDTask}; contact_l/contact_r: {0,1} gates.
    weights/pos_gains/vel_gains override the reference constants per task.
    """
    weights = {**WEIGHTS, **(weights or {})}
    pos_gains = {**POS_GAINS, **(pos_gains or {})}
    vel_gains = {**VEL_GAINS, **(vel_gains or {})}
    nv = 2 * n_dof + 12
    qdd = slice(0, n_dof)

    H = jnp.zeros((nv, nv))
    F = jnp.zeros(nv)
    for name in TASKS:
        t = tasks[name]
        w, kp, kv = weights[name], pos_gains[name], vel_gains[name]
        Ht = w * _mm(t.J.T, t.J)
        target = t.ff + kv * t.vel_err + kp * t.pos_err - t.Jdot_qv
        Ft = -w * _mm(t.J.T, target)
        H = H.at[qdd, qdd].add(Ht)
        F = F.at[qdd].add(Ft)
    # contact-force regularization (inverse_dynamics.py:109)
    H = H.at[jnp.arange(2 * n_dof, nv), jnp.arange(2 * n_dof, nv)].add(1e-6)

    # dynamics equality: [M, -S, -J_c^T] x = -h (inverse_dynamics.py:111-116)
    S = jnp.zeros((n_dof, n_dof)).at[6:, 6:].set(jnp.eye(n_dof - 6))
    Jc = jnp.vstack([contact_l * dyn.J_lfoot, contact_r * dyn.J_rfoot])
    A_eq = jnp.hstack([dyn.M, -S, -Jc.T])
    b_eq = -dyn.h

    # inequalities on the contact wrenches only
    rows = jnp.asarray(np.kron(np.eye(2), _cop_friction_rows(
        foot_size / 2.0, mu)))
    A_in = jnp.zeros((16, nv)).at[:, 2 * n_dof:].set(rows)

    A = jnp.vstack([A_eq, A_in])
    l = jnp.concatenate([b_eq, jnp.full(16, -jnp.inf)])
    u = jnp.concatenate([b_eq, jnp.zeros(16)])

    # The reference's QPSolver minimizes 1/2 x'Hx + F'x with H = sum w J'J
    # (utils.py:41-73) — admm_solve uses the same 1/2 convention, so H
    # passes through unscaled.  (A 2*H here once halved every achieved
    # task acceleration: the QP solution is -(P)^-1 q up to constraints,
    # and the whole-body loop drifted laterally at exactly half gain.)
    res = admm_solve(H, F, A, l, u, jnp.zeros(nv),
                     jnp.zeros(A.shape[0]), settings)
    tau = res.x[n_dof:2 * n_dof]
    return tau[6:], res
