"""Swing-foot trajectory generation — closed-form, jittable, reads the live
plan.

Reproduces FootTrajectoryGenerator.generate_feet_trajectories_at_time
(/root/reference/code/foot_trajectory_generator.py:12-114): cubic polynomial
in xy + yaw between plan[s-1] and plan[s+1] during single support, a quartic
z bump of height `step_height`, frozen poses in double support, and initial
poses during step 0.  Branching is replaced by `where` masks so the function
traces once and is gathered per tick inside `lax.scan` rollouts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.plan.footsteps import FootstepPlan, initial_feet_poses
from cmpc_tpu.plan.timing import GaitTiming


class FeetRef(NamedTuple):
    """Per-foot references in the reference's layout: [ang(3), pos(3)]."""

    pose_l: jnp.ndarray  # (6,)
    vel_l: jnp.ndarray   # (6,)
    acc_l: jnp.ndarray   # (6,)
    pose_r: jnp.ndarray  # (6,)
    vel_r: jnp.ndarray   # (6,)
    acc_r: jnp.ndarray   # (6,)


def _plan_pose(plan: FootstepPlan, j):
    yaw = plan.yaw[j]
    ang = jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw])
    return jnp.concatenate([ang, plan.pos[j]])


def feet_ref_at(t, plan: FootstepPlan, cfg: WalkConfig, timing: GaitTiming,
                foot_y) -> FeetRef:
    """Foot pose/vel/acc references at (traced) tick t."""
    step_idx_t = jnp.asarray(timing.step_idx)[t]
    t_in = jnp.asarray(timing.t_in_step)[t]
    in_ds = jnp.asarray(timing.is_ds)[t]
    support_is_left = jnp.asarray(timing.foot_is_left)[step_idx_t]

    S = timing.num_steps
    s = step_idx_t
    s_prev = jnp.clip(s - 1, 0, S - 1)
    s_next = jnp.clip(s + 1, 0, S - 1)

    # --- single-support interpolation (foot_trajectory_generator.py:62-90)
    start_pose = _plan_pose(plan, s_prev)
    target_pose = _plan_pose(plan, s_next)
    T = jnp.asarray(timing.ss)[s].astype(jnp.float32)
    T = jnp.maximum(T, 1.0)  # step 0 has ss == 0; masked out below
    tf = t_in.astype(jnp.float32)
    delta = cfg.world_time_step

    A = -2.0 / T**3
    B = 3.0 / T**2
    d = target_pose - start_pose
    swing_pose = start_pose + d * (A * tf**3 + B * tf**2)
    swing_vel = d * (3 * A * tf**2 + 2 * B * tf) / delta
    swing_acc = d * (6 * A * tf + 2 * B) / delta**2

    # quartic vertical bump (z is component 5 of [ang, pos])
    H = cfg.step_height
    A4 = 16 * H / T**4
    B4 = -32 * H / T**3
    C4 = 16 * H / T**2
    swing_pose = swing_pose.at[5].set(A4 * tf**4 + B4 * tf**3 + C4 * tf**2)
    swing_vel = swing_vel.at[5].set(
        (4 * A4 * tf**3 + 3 * B4 * tf**2 + 2 * C4 * tf) / delta)
    swing_acc = swing_acc.at[5].set(
        (12 * A4 * tf**2 + 6 * B4 * tf + 2 * C4) / delta**2)

    support_pose_ss = _plan_pose(plan, s)

    # --- double support: support = plan[s], swing(target) = plan[s+1], all
    # velocities zero (foot_trajectory_generator.py:38-60)
    support_pose_ds = _plan_pose(plan, s)
    swing_pose_ds = _plan_pose(plan, s_next)

    support_pose = jnp.where(in_ds, support_pose_ds, support_pose_ss)
    swing_pose = jnp.where(in_ds, swing_pose_ds, swing_pose)
    zero6 = jnp.zeros(6)
    swing_vel = jnp.where(in_ds, zero6, swing_vel)
    swing_acc = jnp.where(in_ds, zero6, swing_acc)

    # assign support/swing to left/right
    pose_l = jnp.where(support_is_left, support_pose, swing_pose)
    pose_r = jnp.where(support_is_left, swing_pose, support_pose)
    vel_l = jnp.where(support_is_left, zero6, swing_vel)
    vel_r = jnp.where(support_is_left, swing_vel, zero6)
    acc_l = jnp.where(support_is_left, zero6, swing_acc)
    acc_r = jnp.where(support_is_left, swing_acc, zero6)

    # --- step 0: hold the initial foot poses
    # (foot_trajectory_generator.py:20-35)
    lpose0, rpose0 = initial_feet_poses(foot_y)
    first = s == 0
    pose_l = jnp.where(first, lpose0, pose_l)
    pose_r = jnp.where(first, rpose0, pose_r)
    vel_l = jnp.where(first, zero6, vel_l)
    vel_r = jnp.where(first, zero6, vel_r)
    acc_l = jnp.where(first, zero6, acc_l)
    acc_r = jnp.where(first, zero6, acc_r)

    return FeetRef(pose_l=pose_l, vel_l=vel_l, acc_l=acc_l,
                   pose_r=pose_r, vel_r=vel_r, acc_r=acc_r)
