"""Whole-body WALKING through the full pipeline (VERDICT r3 next #6).

The reference only ever runs its controller through the ID QP + DART
physics (simulation.py:276-281).  This test drives sim/wholebody_loop
(planner refs -> centroidal MPC -> swing interpolation -> ID QP -> torques
-> articulated impulse-contact plant) through the initial double support,
the FIRST FULL STEP (right-foot swing, t in [200, 270)) and its landing —
the phase that exposed both round-1's solver deadlock and round-4's
ID-ADMM under-convergence (see ops/admm.py rho_adapt).

Scope note: steps beyond the first landing currently accumulate tracking
error on the articulated plant (under investigation); this pins the part
that demonstrably works so regressions turn red.  Marked slow (~300
whole-body ticks: MPC + ID QP + 10 contact substeps each).
"""

import numpy as np
import jax
import pytest

from cmpc_tpu.config import WalkConfig, nominal_scenario
from cmpc_tpu.rbd import urdf
from cmpc_tpu.sim import wholebody_loop as wbl

pytestmark = pytest.mark.slow


def test_wholebody_first_step_and_landing():
    model = urdf.load_hrp4()
    cfg = WalkConfig()
    sc = nominal_scenario(cfg, push=(0.0, 0.0, 0.0), push_window=(0, 0))
    _, tr = jax.jit(lambda s: wbl.rollout(model, s, cfg, T_sim=300))(sc)
    tr = jax.tree.map(np.asarray, tr)

    err_xy = np.linalg.norm(tr.com_pos[:, :2] - tr.com_ref[:, :2], axis=-1)
    assert np.isfinite(tr.com_pos).all()
    # CoM tracks through double support, the swing and the landing
    assert err_xy[:271].max() < 0.03, err_xy[:271].max()
    # post-landing double support drifts as the landing-impact velocity
    # error compounds (the round-5 diagnosis, sim/wholebody_loop.py
    # status note); pinned at its measured envelope (0.071 at the r5
    # config) so further degradation turns red
    assert err_xy.max() < 0.09, err_xy.max()
    # CoM height held (the round-4 ID-ADMM bug free-fell from t~238)
    assert np.abs(tr.com_pos[:, 2] - cfg.h).max() < 0.03
    # the swing foot actually swings: lifts to the commanded ~2 cm apex
    # and comes back down to the ground at the landing
    zr = tr.pose_r[:, 5]
    assert 0.012 < zr[200:270].max() < 0.035, zr[200:270].max()
    assert abs(zr[285:].max()) < 0.01
    # the stance foot never lifts during single support
    assert tr.pose_l[200:270, 5].max() < 0.01
    # the robot moved forward through the step
    assert tr.com_pos[-1, 0] > tr.com_pos[150, 0] + 0.01
