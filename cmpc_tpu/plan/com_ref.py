"""CoM reference generation — quintic spline as a static linear map.

The reference fits a quintic spline through CoM knot points by handing an
*underdetermined feasibility problem* to IPOPT (functions.py:129-157) and
samples it per tick with hand-rolled loops (functions.py:196-248).  IPOPT's
answer to a linear feasibility problem started at zero is (up to solver
regularization) the minimum-norm solution — which is exactly
``pinv(C) @ rhs``.  Since the constraint matrix C and the knot *times* are
static, the whole spline is a precomputed linear map ``coeffs = W @ knots``
followed by static sampling bases; the per-scenario work is two tiny matmuls.

Reference quirks reproduced on purpose (SURVEY.md §7 "hard parts" #4):
* velocity is d/dtau (no division by the segment length in ticks),
* acceleration is d2/dtau2 divided by the segment length **squared in
  ticks** (functions.py:212-248) — so acceleration references are ~1e-4 of
  their physical value,
* the x-spline covers fewer ticks than the y-spline; both are held constant
  past their last sample (the reference would crash there instead).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.plan.footsteps import FootstepPlan
from cmpc_tpu.plan.swing import feet_ref_at
from cmpc_tpu.plan.timing import GaitTiming, build_timing


class ComRef(NamedTuple):
    pos: jnp.ndarray  # (P, 3)
    vel: jnp.ndarray  # (P, 3)
    acc: jnp.ndarray  # (P, 3)


def _knot_ticks(cfg: WalkConfig):
    """Static knot layout (functions.py:11-55): knots every (ss+ds) ticks
    starting at first_contact_time = 2*scale + ss + 1."""
    scale = cfg.ss_duration + cfg.ds_duration
    first_time_knot = 2 * scale
    first_contact = first_time_knot + cfg.ss_duration + 1
    ticks = [i for i in range(first_time_knot, cfg.num_steps * scale - 1)
             if (i - first_contact) % scale == 0]
    seq_x = [first_time_knot] + ticks
    seq_y = [first_time_knot] + [i + cfg.ds_duration - 1 for i in ticks]
    return ticks, seq_x, seq_y


@functools.lru_cache(maxsize=8)
def _spline_statics(cfg: WalkConfig):
    """Precompute the min-norm coefficient map W (6n, n) and per-axis
    sampling bases.  Constraint rows follow quintic_spline
    (functions.py:129-157) exactly."""
    ticks, seq_x, seq_y = _knot_ticks(cfg)
    n = 2 + len(ticks)          # number of knots
    nv = 6 * n
    rows, rhs_sel = [], []

    def add(row, sel_idx=None):
        rows.append(row)
        sel = np.zeros(n)
        if sel_idx is not None:
            sel[sel_idx] = 1.0
        rhs_sel.append(sel)

    for i in range(n - 1):
        r = np.zeros(nv); r[6 * i] = 1.0
        add(r, i)                                   # p(0) of segment i == x[i]
        r = np.zeros(nv); r[6 * i:6 * i + 6] = 1.0
        add(r, i + 1)                               # p(1) of segment i == x[i+1]
    r = np.zeros(nv); r[1] = 1.0; add(r)            # zero initial velocity
    r = np.zeros(nv); r[6 * (n - 1) + 1] = 1.0; add(r)  # zero final velocity
    for i in range(n - 1):                          # velocity continuity
        r = np.zeros(nv)
        r[6 * i + 1:6 * i + 6] = [1, 2, 3, 4, 5]
        r[6 * (i + 1) + 1] = -1.0
        add(r)
    r = np.zeros(nv); r[2] = 2.0; add(r)            # zero initial acceleration
    for i in range(n - 1):                          # acceleration continuity
        r = np.zeros(nv)
        r[6 * i + 2:6 * i + 6] = [2, 6, 12, 20]
        r[6 * (i + 1) + 2] = -2.0
        add(r)

    C = np.stack(rows)                  # (m, 6n)
    Rsel = np.stack(rhs_sel)            # (m, n)
    W = np.linalg.pinv(C) @ Rsel        # (6n, n): coeffs = W @ knots

    def bases(seq):
        L = seq[-1]
        seg = np.searchsorted(np.asarray(seq), np.arange(L), side="right")
        prev = np.concatenate([[0], seq])[seg]
        length = (np.asarray(seq)[seg] - prev).astype(np.float64)
        tau = (np.arange(L) - prev) / length
        bpos = np.stack([np.ones(L), tau, tau**2, tau**3, tau**4, tau**5], 1)
        bvel = np.stack([np.zeros(L), np.ones(L), 2 * tau, 3 * tau**2,
                         4 * tau**3, 5 * tau**4], 1)
        bacc = np.stack([np.zeros(L), np.zeros(L), 2 * np.ones(L), 6 * tau,
                         12 * tau**2, 20 * tau**3], 1)
        if cfg.physical_ref_units:
            # d/dt = d/dtau / (segment duration in seconds)
            secs = length * cfg.world_time_step
            bvel = bvel / secs[:, None]
            bacc = bacc / secs[:, None] ** 2
        else:
            # reference quirk: velocity is d/dtau, acceleration is
            # d2/dtau2 divided by the segment length in *ticks* squared
            bacc = bacc / length[:, None] ** 2
        return seg.astype(np.int32), bpos, bvel, bacc

    return n, W, bases(tuple(seq_x)), bases(tuple(seq_y))


def _sample(coeffs, base, P):
    """coeffs (n, 6); base = (seg, bpos, bvel, bacc) of length L; pad-hold
    to P ticks. Returns pos, vel, acc of shape (P,)."""
    seg, bpos, bvel, bacc = base
    c = coeffs[jnp.asarray(seg)]                 # (L, 6)
    out = []
    for b in (bpos, bvel, bacc):
        v = jnp.sum(c * jnp.asarray(b), axis=-1)  # (L,)
        v = jnp.concatenate([v, jnp.full(P - v.shape[0], 0.0) + v[-1]])
        out.append(v)
    return out


def build_com_ref(plan: FootstepPlan, cfg: WalkConfig, timing: GaitTiming,
                  foot_y) -> ComRef:
    """Jittable CoM reference: knots from the (initial) plan's feet
    trajectories, min-norm quintic coefficients, per-tick samples.

    Matches references() + compute_knot (functions.py:11-124): x knots are
    midfeet x; y knots are the upcoming swing-target foot's y scaled by 0.6;
    z is constant h with zero vel/acc.
    """
    ticks, _, _ = _knot_ticks(cfg)
    n, W, base_x, base_y = _spline_statics(cfg)
    P = cfg.pad_ticks

    eval_ticks = jnp.asarray([0] + ticks, dtype=jnp.int32)
    feet = jax.vmap(lambda t: feet_ref_at(t, plan, cfg, timing, foot_y))(
        eval_ticks)
    mid_x = (feet.pose_l[:, 3] + feet.pose_r[:, 3]) / 2.0
    # the foot whose y is sampled: plan[1] at t=0, plan[k+2] at knot k
    # (compute_knot, functions.py:24-47)
    sel_plan_idx = np.array(
        [1] + [min(k + 2, cfg.num_steps - 1) for k in range(len(ticks))])
    sel_is_left = jnp.asarray(
        np.asarray(timing.foot_is_left)[sel_plan_idx])
    sel_y = jnp.where(sel_is_left, feet.pose_l[:, 4], feet.pose_r[:, 4])

    knot_x = jnp.concatenate([mid_x[:1], mid_x])          # duplicated first
    knot_y = jnp.concatenate([(feet.pose_l[:1, 4] + feet.pose_r[:1, 4]) / 2.0,
                              sel_y * cfg.knot_y_scale])

    co_x = (jnp.asarray(W) @ knot_x).reshape(n, 6)
    co_y = (jnp.asarray(W) @ knot_y).reshape(n, 6)

    px, vx, ax = _sample(co_x, base_x, P)
    py, vy, ay = _sample(co_y, base_y, P)
    pz = jnp.full(P, cfg.h)
    zz = jnp.zeros(P)

    return ComRef(pos=jnp.stack([px, py, pz], -1),
                  vel=jnp.stack([vx, vy, zz], -1),
                  acc=jnp.stack([ax, ay, zz], -1))
