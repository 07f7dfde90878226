"""Payload drop on the ARTICULATED plant (VERDICT r3 next #7).

The reference's second scenario (simulation_payload.py) loads
hrp4_payload.urdf (arm/chest collision boxes) plus box.urdf (a 2 kg plank
free-dropped onto the arms at t=0, box.urdf:79-83) and keeps the MPC's
nominal mass model — robustness comes from the adaptation law.  Here the
resting box is a persistent downward wrench at the arms' offset plus the
one-tick free-fall impact impulse (sim/wholebody_loop.py), applied to the
whole-body plant built from assets/hrp4_payload.json.

Marked slow: ~150 whole-body ticks (MPC + ID QP + contact substeps each).
"""

import numpy as np
import jax
import pytest

from cmpc_tpu.config import WalkConfig, payload_scenario
from cmpc_tpu.rbd import urdf
from cmpc_tpu.sim import wholebody_loop as wbl

pytestmark = pytest.mark.slow


def test_payload_drop_on_wholebody_plant():
    """2 kg box dropped during the initial double support: the robot
    absorbs the impact and keeps standing (CoM tracking bounded, feet
    grounded), with the MPC's mass model left nominal."""
    model = urdf.load_hrp4(payload=True)
    cfg = WalkConfig()
    sc = payload_scenario(cfg, onset_tick=30)
    _, tr = jax.jit(lambda s: wbl.rollout(model, s, cfg, T_sim=150))(sc)
    tr = jax.tree.map(np.asarray, tr)

    err_xy = np.linalg.norm(tr.com_pos[:, :2] - tr.com_ref[:, :2], axis=-1)
    assert np.isfinite(tr.com_pos).all()
    assert err_xy.max() < 0.08, err_xy.max()
    # the impact dips the CoM but the controller recovers the height
    assert tr.com_pos[:, 2].min() > cfg.h - 0.06
    assert abs(tr.com_pos[-1, 2] - cfg.h) < 0.03
    # feet never leave the ground during double support
    assert tr.pose_l[:, 5].max() < 0.02
    assert tr.pose_r[:, 5].max() < 0.02
