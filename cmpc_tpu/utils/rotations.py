"""Rotation utilities (JAX-native, batched).

Replaces the reference's scipy.spatial.transform.Rotation usage
(/root/reference/code/utils.py:5-19) with pure jnp so everything vmaps and
jits.  Only what the controller needs: z-axis (yaw) rotations, rotation
matrix <-> rotation vector, and rotation-vector differences.
"""

from __future__ import annotations

import jax.numpy as jnp


def rot_z(yaw):
    """Rotation about z. yaw: (...,) -> (..., 3, 3)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    return jnp.stack([
        jnp.stack([c, -s, z], axis=-1),
        jnp.stack([s, c, z], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


def hat(v):
    """Skew-symmetric matrix of v: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


def rotvec_to_matrix(rv):
    """Rodrigues formula, (..., 3) -> (..., 3, 3); safe at the identity."""
    theta = jnp.linalg.norm(rv, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = jnp.where(small, jnp.zeros_like(rv).at[..., 0].set(1.0),
                     rv / jnp.where(small, 1.0, theta))
    K = hat(axis)
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    R = eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)
    return jnp.where(small[..., None], eye + hat(rv), R)


def matrix_to_rotvec(R):
    """(..., 3, 3) -> (..., 3). Stable for small angles; angle < pi assumed
    (true for all torso/feet orientations in the walking task)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    w = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1)
    sin_theta = jnp.sin(theta)
    small = theta < 1e-6
    scale = jnp.where(small, 0.5, theta / jnp.where(small, 1.0, 2.0 * sin_theta))
    return w * scale[..., None]


def rotvec_difference(rv_a, rv_b):
    """Rotation vector of R_b^{-1} R_a — the orientation error used by the
    whole-body ID task PD laws (reference utils.py:5-9)."""
    Ra = rotvec_to_matrix(rv_a)
    Rb = rotvec_to_matrix(rv_b)
    return matrix_to_rotvec(jnp.swapaxes(Rb, -1, -2) @ Ra)


def pose_difference(pose_a, pose_b):
    """6-dof pose error [pos_diff, rotvec_diff]; poses are [pos(3), rotvec(3)]
    (reference utils.py:11-14)."""
    pos = pose_a[..., :3] - pose_b[..., :3]
    rot = rotvec_difference(pose_a[..., 3:], pose_b[..., 3:])
    return jnp.concatenate([pos, rot], axis=-1)
