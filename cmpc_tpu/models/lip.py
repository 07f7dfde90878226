"""Linear Inverted Pendulum model — the legacy IS-MPC baseline's plant.

Mirrors original_code/ismpc.py:17-26: per-axis state [com, com_dot, zmp],
input zmp velocity; the z axis carries a -g drift.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def lip_matrices(eta: float):
    """A (3,3), B (3,1) of a single axis (original_code/ismpc.py:18-19)."""
    A = np.array([[0.0, 1.0, 0.0],
                  [eta ** 2, 0.0, -eta ** 2],
                  [0.0, 0.0, 0.0]])
    B = np.array([[0.0], [0.0], [1.0]])
    return A, B


def lip_dynamics(x, u, eta: float, g: float):
    """Full 9-dim stacked dynamics f(x, u) (original_code/ismpc.py:22-26).
    x: (9,) = [x-axis(3), y-axis(3), z-axis(3)], u: (3,) zmp velocities."""
    A, B = lip_matrices(eta)
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    drift = jnp.array([0.0, -g, 0.0])
    fx = A @ x[0:3] + B[:, 0] * u[0]
    fy = A @ x[3:6] + B[:, 0] * u[1]
    fz = A @ x[6:9] + B[:, 0] * u[2] + drift
    return jnp.concatenate([fx, fy, fz])
