"""Linear Kalman filter — batched port of original_code/filter.py.

Pure functional predict/update over a (state, covariance) pytree; vmaps
over scenario batches.  Used by the IS-MPC baseline loop to filter the
9-dim LIP state (original_code/simulation.py:103-153).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


class KalmanModel(NamedTuple):
    A: jnp.ndarray   # (n, n) state transition
    B: jnp.ndarray   # (n, k) control input
    d: jnp.ndarray   # (n,) drift
    H: jnp.ndarray   # (p, n) observation
    Q: jnp.ndarray   # (n, n) process noise covariance
    R: jnp.ndarray   # (p, p) measurement noise covariance


class KalmanState(NamedTuple):
    x: jnp.ndarray   # (n,)
    P: jnp.ndarray   # (n, n)


def predict(model: KalmanModel, s: KalmanState, u) -> KalmanState:
    """original_code/filter.py:14-17."""
    x = _mm(model.A, s.x) + _mm(model.B, u) + model.d
    P = _mm(_mm(model.A, s.P), model.A.T) + model.Q
    return KalmanState(x=x, P=P)


def update(model: KalmanModel, s: KalmanState, z) -> KalmanState:
    """original_code/filter.py:19-32."""
    S = _mm(_mm(model.H, s.P), model.H.T) + model.R
    K = jnp.linalg.solve(S.T, _mm(model.H, s.P.T)).T  # P H' S^-1
    y = z - _mm(model.H, s.x)
    x = s.x + _mm(K, y)
    I = jnp.eye(s.P.shape[0])
    P = _mm(I - _mm(K, model.H), s.P)
    return KalmanState(x=x, P=P)


def lip_kalman_model(eta: float, delta: float, g: float = 9.81,
                     q_pos=1e-4, q_vel=1e-3, q_zmp=1e-4,
                     r_pos=1e-4, r_vel=1e-2, r_zmp=1e-2) -> KalmanModel:
    """Block-diagonal 9-dim LIP filter model, one (com, com_dot, zmp) block
    per axis, matching the wiring at original_code/simulation.py:103-131
    (including the -g*delta drift on the vertical velocity, :106)."""
    import numpy as np
    A1 = np.array([[1.0, delta, 0.0],
                   [eta ** 2 * delta, 1.0, -eta ** 2 * delta],
                   [0.0, 0.0, 1.0]])
    B1 = np.array([[0.0], [0.0], [delta]])
    blk = lambda M: np.kron(np.eye(3), M)
    d = np.zeros(9)
    d[7] = -delta * g
    return KalmanModel(
        A=jnp.asarray(blk(A1)),
        B=jnp.asarray(np.kron(np.eye(3), B1)),
        d=jnp.asarray(d),
        H=jnp.asarray(np.eye(9)),
        Q=jnp.asarray(blk(np.diag([q_pos, q_vel, q_zmp]))),
        R=jnp.asarray(blk(np.diag([r_pos, r_vel, r_zmp]))),
    )
