"""Plan-layer parity tests against the reference's recorded debug traces.

Goldens: /root/reference/code/Debug/"Pos Lfoot pre trj" and
"Pos Rfoot pre trj" — 2000 per-tick swing/support foot positions dumped by
the reference run (simulation.py:119-127) with the default 20-step velocity
script.  These files are *data produced by* the reference, used as an
acceptance oracle (SURVEY.md §4), not code.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmpc_tpu.config import WalkConfig, default_vref, DEFAULT_FOOT_Y
from cmpc_tpu.plan.timing import build_timing
from cmpc_tpu.plan.footsteps import plan_footsteps, contact_pose_refs
from cmpc_tpu.plan.swing import feet_ref_at
from cmpc_tpu.plan.com_ref import build_com_ref

GOLDEN_L = "/root/reference/code/Debug/Pos Lfoot pre trj"
GOLDEN_R = "/root/reference/code/Debug/Pos Rfoot pre trj"


@pytest.fixture(scope="module")
def cfg():
    return WalkConfig()


@pytest.fixture(scope="module")
def timing(cfg):
    return build_timing(cfg)


@pytest.fixture(scope="module")
def plan(cfg, timing):
    vref = jnp.asarray(default_vref(cfg.num_steps))
    return plan_footsteps(vref, cfg, timing, jnp.asarray(DEFAULT_FOOT_Y))


def test_timing_totals(cfg, timing):
    assert timing.total_ticks == 2100  # 200 + 19 * 100
    assert timing.step_idx[0] == 0
    assert timing.step_idx[199] == 0
    assert timing.step_idx[200] == 1
    assert timing.step_idx[299] == 1
    # phases: step 1 is ss for 70 ticks then ds for 30
    assert not timing.is_ds[200]
    assert not timing.is_ds[269]
    assert timing.is_ds[270]
    assert timing.is_ds[299]
    # step 0 is all double support
    assert timing.is_ds[:200].all()


def test_gamma_gates(cfg, timing):
    # during step 1 single support the support foot is plan[1].foot_id
    # (lfoot for first_swing == rfoot)
    assert timing.foot_is_left[1]
    assert timing.gamma_l[210] == 1.0 and timing.gamma_r[210] == 0.0
    assert timing.gamma_l[280] == 1.0 and timing.gamma_r[280] == 1.0
    # step 2: right foot is support
    assert timing.gamma_l[310] == 0.0 and timing.gamma_r[310] == 1.0


def test_update_event_timing(cfg, timing):
    # With ss=70, ds=30, N=10, rate=1 the adaptation event fires at
    # t_in_step == 61 of every swinging step (first tick where
    # phase(t + N - 1) is ds while phase(t) is ss).
    ev = np.nonzero(timing.update_event)[0]
    assert len(ev) > 0
    for t in ev:
        assert timing.t_in_step[t] == 61
        assert not timing.is_ds[t]


def test_footstep_positions(cfg, timing, plan):
    pos = np.asarray(plan.pos)
    # plan[0]: right foot at (0, -0.1); plan[1]: left at (0, +0.1)
    np.testing.assert_allclose(pos[0, :2], [0.0, -0.1], atol=1e-12)
    np.testing.assert_allclose(pos[1, :2], [0.0, 0.1], atol=1e-12)
    # cumulative x: 9 steps of 0.15, 4 of 0.13, 2 of 0.1, 3 of 0
    np.testing.assert_allclose(pos[-1, 0], 2.07, atol=1e-6)
    np.testing.assert_allclose(pos[-1, 2], 0.0, atol=1e-12)
    # alternating lateral offsets
    assert (np.sign(pos[::2, 1]) == -1).all()
    assert (np.sign(pos[1::2, 1]) == 1).all()


def _load_golden(path):
    return np.loadtxt(path)


def test_swing_trajectories_match_reference_dump(cfg, timing, plan):
    gl = _load_golden(GOLDEN_L)
    gr = _load_golden(GOLDEN_R)
    T = gl.shape[0]
    foot_y = jnp.asarray(DEFAULT_FOOT_Y)
    feet = jax.jit(jax.vmap(
        lambda t: feet_ref_at(t, plan, cfg, timing, foot_y)))(jnp.arange(T))
    pl = np.asarray(feet.pose_l[:, 3:6], dtype=np.float64)
    pr = np.asarray(feet.pose_r[:, 3:6], dtype=np.float64)
    np.testing.assert_allclose(pl, gl, atol=2e-5)
    np.testing.assert_allclose(pr, gr, atol=2e-5)


def test_contact_pose_refs_consistency(cfg, timing, plan):
    pose_l, pose_r = contact_pose_refs(plan, timing)
    pl = np.asarray(pose_l)
    pr = np.asarray(pose_r)
    # early ticks: left ref = plan[1], right ref = plan[0]
    np.testing.assert_allclose(pl[0, 3:5], [0.0, 0.1], atol=1e-7)
    np.testing.assert_allclose(pr[0, 3:5], [0.0, -0.1], atol=1e-7)
    # during any double support both refs equal planted feet (z == 0)
    assert np.allclose(pl[:, 5], 0.0) and np.allclose(pr[:, 5], 0.0)
    # refs only move forward in x
    assert (np.diff(pl[:, 3]) >= -1e-9).all()
    assert (np.diff(pr[:, 3]) >= -1e-9).all()


def test_com_ref_shapes_and_smoothness(cfg, timing, plan):
    ref = jax.jit(lambda p: build_com_ref(p, cfg, timing,
                                          jnp.asarray(DEFAULT_FOOT_Y)))(plan)
    pos = np.asarray(ref.pos, dtype=np.float64)
    vel = np.asarray(ref.vel, dtype=np.float64)
    P = cfg.pad_ticks
    assert pos.shape == (P, 3)
    # z constant at h
    np.testing.assert_allclose(pos[:, 2], cfg.h, atol=1e-7)
    # x starts near 0, ends near the walk's final midfeet x (2.07)
    assert abs(pos[0, 0]) < 1e-3
    assert abs(pos[-1, 0] - 2.07) < 0.15
    # x is monotone non-decreasing (forward walk) up to small numerics
    assert (np.diff(pos[:, 0]) > -1e-3).all()
    # continuity: no jumps in position
    assert np.max(np.abs(np.diff(pos[:, 0]))) < 5e-3
    assert np.max(np.abs(np.diff(pos[:, 1]))) < 5e-3
    # y oscillates between the feet with the 0.6 scale (knot max 0.061,
    # plus a little inter-knot quintic overshoot)
    assert np.max(np.abs(pos[:, 1])) < 0.066
    # initial and final velocity of each spline ~ 0 at spline boundaries
    assert abs(vel[0, 0]) < 1e-6 and abs(vel[0, 1]) < 1e-6


def test_com_knot_interpolation(cfg, timing, plan):
    """The spline must pass through its knots: at knot tick 271+100k the
    x-position equals midfeet of plan[k+1], plan[k+2]."""
    ref = build_com_ref(plan, cfg, timing, jnp.asarray(DEFAULT_FOOT_Y))
    pos = np.asarray(ref.pos, dtype=np.float64)
    plan_pos = np.asarray(plan.pos)
    for k in range(0, 16, 3):
        t_knot = 271 + 100 * k
        expected = (plan_pos[k + 1, 0] + plan_pos[k + 2, 0]) / 2.0
        assert abs(pos[t_knot, 0] - expected) < 1e-4, (k, pos[t_knot, 0],
                                                       expected)
