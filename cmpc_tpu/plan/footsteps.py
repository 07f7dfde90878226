"""Footstep plan positions — jittable, batched over scenarios.

The reference integrates a virtual unicycle over per-step velocity commands
with explicit Euler sub-steps and places footsteps at alternating lateral
offsets (footstep_planner_vertices.py:23-66).  Durations and foot parity are
static (see plan/timing.py); the *positions* computed here are traced arrays
so they can (a) differ per batched scenario and (b) be updated online by the
MPC's footstep-adaptation event.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.plan.timing import GaitTiming


class FootstepPlan(NamedTuple):
    """The plan as arrays. `pos` is part of the closed-loop carried state
    (the MPC writes adapted footsteps into it); `yaw` is never adapted."""

    pos: jnp.ndarray   # (S, 3) footstep positions, z == 0
    yaw: jnp.ndarray   # (S,)   footstep yaw angles


def initial_feet_poses(foot_y):
    """[ang(3), pos(3)] poses of the soles at t=0, matching the reference's
    initial robot placement (simulation.py:72-77): feet mirrored about x-z."""
    z3 = jnp.zeros(3)
    lpose = jnp.concatenate([z3, jnp.stack([0.0 * foot_y, foot_y, 0.0 * foot_y])])
    rpose = jnp.concatenate([z3, jnp.stack([0.0 * foot_y, -foot_y, 0.0 * foot_y])])
    return lpose, rpose


def plan_footsteps(vref, cfg: WalkConfig, timing: GaitTiming,
                   foot_y, step_y_offset=0.1) -> FootstepPlan:
    """Integrate the unicycle and place S footsteps.

    vref: (S, 3) per-step velocity commands (vx, vy, omega).
    Matches the reference exactly: steps 0 and 1 do not move the unicycle;
    step j>1 integrates its command with Euler sub-steps of world_time_step
    for its whole (ss + ds) duration, updating theta before position
    (footstep_planner_vertices.py:38-43).
    """
    dt = cfg.world_time_step
    S = cfg.num_steps
    durations = np.asarray(timing.ss + timing.ds)  # static ints

    # Initial unicycle state: midpoint/mean of the two feet
    # (footstep_planner_vertices.py:17-18).
    lpose, rpose = initial_feet_poses(foot_y)
    upos = (lpose[3:5] + rpose[3:5]) / 2.0
    utheta = (lpose[2] + rpose[2]) / 2.0

    # lateral displacement: +step_y_offset when the *plan entry's* foot is
    # the left one (the reference hard-codes 0.1 m,
    # footstep_planner_vertices.py:33-36; scenario data here)
    disp_sign = jnp.where(jnp.asarray(timing.foot_is_left),
                          step_y_offset, -step_y_offset)

    def integrate_step(carry, inp):
        upos, utheta = carry
        cmd, j = inp
        dur = durations[0]  # placeholder; actual handled below

        def substep(_, c):
            p, th = c
            th = th + cmd[2] * dt
            R = jnp.array([[jnp.cos(th), -jnp.sin(th)],
                           [jnp.sin(th), jnp.cos(th)]])
            p = p + R @ cmd[:2] * dt
            return (p, th)

        # All steps j>1 share the same static duration (ss+ds); steps 0 and 1
        # never integrate, so a single fori_loop bound is enough.
        n_sub = int(durations[2]) if S > 2 else 0
        newpos, newtheta = jax.lax.fori_loop(0, n_sub, substep, (upos, utheta))
        moved = j > 1
        upos = jnp.where(moved, newpos, upos)
        utheta = jnp.where(moved, newtheta, utheta)
        return (upos, utheta), (upos, utheta)

    idx = jnp.arange(S)
    (_, _), (upos_seq, utheta_seq) = jax.lax.scan(
        integrate_step, (upos, utheta), (jnp.asarray(vref), idx))

    displ = jnp.stack([-jnp.sin(utheta_seq), jnp.cos(utheta_seq)],
                      axis=-1) * disp_sign[:, None]
    xy = upos_seq + displ
    pos = jnp.concatenate([xy, jnp.zeros((S, 1))], axis=-1)
    return FootstepPlan(pos=pos, yaw=utheta_seq)


def contact_pose_refs(plan: FootstepPlan, timing: GaitTiming):
    """Per-tick contact pose references [ang(3), pos(3)] for both feet,
    gathered from the plan with the static parity tables — the arrays the
    reference builds once in gen_pos_contacts_ref_at_time
    (footstep_planner_vertices.py:106-147) and feeds to the MPC as cost and
    stance-box references.  Returns (pose_l, pose_r), each (P, 6)."""
    def gather(idx):
        p = plan.pos[idx]            # (P, 3)
        yaw = plan.yaw[idx]          # (P,)
        ang = jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw],
                        axis=-1)
        return jnp.concatenate([ang, p], axis=-1)

    return (gather(jnp.asarray(timing.left_ref_idx)),
            gather(jnp.asarray(timing.right_ref_idx)))
