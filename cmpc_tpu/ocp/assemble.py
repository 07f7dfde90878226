"""Per-tick assembly of MPC parameters from precomputed reference arrays.

This is the functional equivalent of the parameter-update half of the
reference's solve() (centroidal_mpc_vertices.py:480-600): pack the measured
state into x0 (with the stance-position override), slice the CoM/contact
references over the horizon at t + (1+i)*mpc_rate, and gather the contact
gates Gamma over t + i*mpc_rate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.models import centroidal as cm
from cmpc_tpu.ocp.problem import MPCParams
from cmpc_tpu.plan.com_ref import ComRef
from cmpc_tpu.plan.footsteps import FootstepPlan
from cmpc_tpu.plan.timing import GaitTiming


class RefArrays(NamedTuple):
    """Per-scenario precomputed reference arrays (length P ticks)."""

    com: ComRef
    pose_ref_l: jnp.ndarray  # (P, 6) [ang, pos] from the *initial* plan
    pose_ref_r: jnp.ndarray  # (P, 6)


def pack_x0(com_pos, com_vel, hw, theta_hat, pose_l, pose_r,
            t, plan: FootstepPlan, refs: RefArrays, timing: GaitTiming,
            cfg: WalkConfig | None = None):
    """Measured-state packing with the reference's quirks
    (centroidal_mpc_vertices.py:482-509):

    * hw NEGATED (cfg.hw_meas_negated — the reference's retrieve_state
      sign quirk, simulation.py:357-358; load-bearing, see WalkConfig);
    * foot yaw from the measured pose's ang-z, foot z forced to 0;
    * stance feet's positions replaced by the stance override — the static
      per-tick contact ref before the first-step cutoff, the *live* plan
      (parity-indexed at t - ss_duration) after.

    Swing-foot source (``cfg.x0_swing_from_traj``, default True): the
    reference pins the *swing* foot at its take-off plan position for the
    whole single-support phase and teleports it to the landing position at
    the first double-support tick (the t-70 lagged plan lookup,
    centroidal_mpc_vertices.py:493-509).  Late-single-support solves then
    require an in-horizon foot "teleport" (tens of m/s on the unbounded
    foot-velocity inputs) that IPOPT absorbs but a proximally damped SQP
    cannot — the round-1 landing-divergence root cause.  With the flag on,
    the swing foot's x0 instead tracks the commanded swing trajectory (its
    physically measured position — what ``current['lfoot']`` would be
    before the reference overrides it), so the subproblem's foot transfer
    is always a physical-velocity move.  Set False to reproduce the
    reference packing bit-for-bit.
    """
    from_table = jnp.asarray(timing.stance_from_table)[t]
    sl = jnp.asarray(timing.stance_left_idx)[t]
    sr = jnp.asarray(timing.stance_right_idx)[t]
    stance_l = jnp.where(from_table, refs.pose_ref_l[t, 3:6], plan.pos[sl])
    stance_r = jnp.where(from_table, refs.pose_ref_r[t, 3:6], plan.pos[sr])

    if cfg is not None and cfg.x0_swing_from_traj:
        gl = jnp.asarray(timing.gamma_l)[t]
        gr = jnp.asarray(timing.gamma_r)[t]
        foot_l = jnp.where(gl > 0.5, stance_l, pose_l[3:6])
        foot_r = jnp.where(gr > 0.5, stance_r, pose_r[3:6])
    else:
        foot_l, foot_r = stance_l, stance_r

    # the reference measures hw NEGATED (simulation.py:357-358) — a
    # load-bearing quirk: see WalkConfig.hw_meas_negated
    if cfg is not None and cfg.hw_meas_negated:
        hw = -hw

    return jnp.concatenate([
        com_pos, com_vel, hw, theta_hat,
        pose_l[2][None], foot_l,
        pose_r[2][None], foot_r,
    ])


def gather_params(t, x0, refs: RefArrays, timing: GaitTiming,
                  cfg: WalkConfig, k1, k2, mass) -> MPCParams:
    N, rate = cfg.N, cfg.mpc_rate
    idx = t + (1 + jnp.arange(N)) * rate              # nodes 1..N
    com_ref = jnp.concatenate([refs.com.pos[idx], refs.com.vel[idx],
                               refs.com.acc[idx]], axis=-1)
    gidx = t + jnp.arange(N + 1) * rate
    return MPCParams(
        x0=x0,
        com_ref=com_ref,
        pos_ref_l=refs.pose_ref_l[idx, 3:6],
        pos_ref_r=refs.pose_ref_r[idx, 3:6],
        yaw_ref_l=refs.pose_ref_l[idx, 2],
        yaw_ref_r=refs.pose_ref_r[idx, 2],
        gamma_l=jnp.asarray(timing.gamma_l)[gidx],
        gamma_r=jnp.asarray(timing.gamma_r)[gidx],
        k1=k1, k2=k2, mass=mass,
    )
