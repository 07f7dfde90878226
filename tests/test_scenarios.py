"""Scenario-event tests: ZMP estimation (simulation.py:328-348) and the
payload-drop event (simulation_payload.py + box.urdf:79-83)."""

import numpy as np
import jax
import jax.numpy as jnp

from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.wholebody.state import zmp_estimate


def test_zmp_estimate_double_support():
    """Symmetric vertical loading on two flat feet puts the ZMP at the
    centroid of the loaded corners, inside the support polygon."""
    m, g, h = 40.05, 9.81, 0.72
    feet_y = (0.1, -0.1)
    pts = []
    for fy in feet_y:
        for dx, dy in ((0.125, 0.065), (0.125, -0.065),
                       (-0.125, -0.065), (-0.125, 0.065)):
            pts.append([dx, fy + dy, 0.0])
    pts = jnp.asarray(pts)
    fz = m * g / 8.0
    forces = jnp.tile(jnp.asarray([0.0, 0.0, fz]), (8, 1))
    com = jnp.asarray([0.0, 0.0, h])
    zmp = zmp_estimate(pts, forces, com, jnp.asarray([0.0, 0.1, 0.0]),
                       m, g, h)
    zmp = np.asarray(zmp)
    assert abs(zmp[0]) < 1e-5
    assert abs(zmp[1]) < 1e-5
    # zmp_z = com_z - Fz / (m g / h) = h - h = 0
    assert abs(zmp[2]) < 1e-5


def test_zmp_estimate_contact_loss_returns_prev():
    pts = jnp.zeros((8, 3))
    forces = jnp.zeros((8, 3))
    prev = jnp.asarray([0.03, -0.01, 0.0])
    zmp = zmp_estimate(pts, forces, jnp.asarray([0.0, 0.0, 0.72]),
                       jnp.asarray([0.0, 0.1, 0.0]), 40.05, 9.81, 0.72,
                       prev_zmp=prev)
    assert np.allclose(np.asarray(zmp), np.asarray(prev))


def test_zmp_estimate_single_support_weighted():
    """Asymmetric loading shifts the ZMP toward the loaded foot."""
    pts = jnp.asarray([[0.0, 0.1, 0.0], [0.0, -0.1, 0.0],
                       [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    forces = jnp.asarray([[0.0, 0.0, 300.0], [0.0, 0.0, 100.0],
                          [0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    zmp = np.asarray(zmp_estimate(
        pts, forces, jnp.asarray([0.0, 0.0, 0.72]),
        jnp.asarray([0.0, 0.1, 0.0]), 40.05, 9.81, 0.72))
    assert 0.02 < zmp[1] < 0.08  # between feet, biased left


def test_payload_onset_event_changes_plant():
    """The payload mass step + impact impulse perturbs the rollout only
    after the onset tick."""
    from cmpc_tpu.sim import closed_loop
    cfg = WalkConfig(num_steps=4, ss_duration=7, ds_duration=3,
                     sqp_iters=1, pdip_iters=5)
    base = nominal_scenario(cfg, push=(0.0, 0.0, 0.0), push_window=(0, 0))
    onset = 12
    sc_pl = base._replace(payload_mass=jnp.asarray(2.0),
                          payload_onset=jnp.asarray(onset),
                          payload_impact_vel=jnp.asarray(1.4))
    T = 20
    run = jax.jit(lambda s: closed_loop.rollout(s, cfg, T_sim=T)[1].com_pos)
    com_a, com_b = run(base), run(sc_pl)
    d = np.abs(np.asarray(com_a) - np.asarray(com_b)).max(axis=1)
    assert d[:onset + 1].max() < 1e-7, d[:onset + 1].max()
    assert d[onset + 2:].max() > 1e-6
