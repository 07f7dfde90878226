"""Closed-loop parity against the reference's *recorded* run artifacts
(VERDICT r2 next-round #4; SURVEY.md §4 acceptance oracle).

The reference bundles three kinds of closed-loop traces:

* ``original_code/cuhw.txt`` — per-tick MEASURED whole-body angular
  momentum of the centroidal-MPC walk (1,962 ticks), appended by the
  driver each tick and used by ``original_code/plot.py`` as the
  "centroidal" series.  This is the only recorded closed-loop *state*
  trajectory of the flagship walk.
* ``original_code/hw_des.txt`` — the matching per-tick MPC-predicted h_w.
* ``code/Debug/contact_trj_from_centroidal_MPC`` — 2,500 ticks of
  commanded foot poses from a centroidal-MPC run.  NOTE, measured: that
  dump was produced with a *different configuration* than the shipped
  defaults — its initial double support is 300 ticks (default: 200,
  footstep_planner_vertices.py:28-31) and its first stride is 0.40 m
  (default velocity script: 0.30 m) — so only configuration-independent
  structure is asserted from it.  The *pre-planned* trajectories for the
  shipped defaults ("Pos Lfoot pre trj") are golden-checked exactly in
  test_plan.py.

The reference records no CoM or ground-reaction-force traces, so CoM-path
parity is necessarily indirect: our plant's h_w must reproduce the scale
and waveform of the reference robot's measured h_w, which integrates the
same tipping physics the CoM path drives.
"""

import re

import numpy as np
import pytest

CUHW = "/root/reference/original_code/cuhw.txt"
HW_DES = "/root/reference/original_code/hw_des.txt"
CONTACT_TRJ = "/root/reference/code/Debug/contact_trj_from_centroidal_MPC"


def _load_pose_dump(path):
    L, R = [], []
    for line in open(path):
        if "POSE" not in line:
            continue
        nums = re.findall(r"[-+0-9.e]+", line.split("Lfoot_POSE:")[1])
        vals = [float(x) for x in nums]
        L.append(vals[:6])
        R.append(vals[6:12])
    return np.asarray(L), np.asarray(R)


def test_hw_scale_and_waveform_vs_reference(walk500):
    """Plant angular momentum must live on the reference robot's scale and
    reproduce its dominant (roll-axis) waveform over the first 500 ticks
    (long double support + three steps).

    cuhw.txt rows are the reference's retrieve_state() h_w — the NEGATED
    whole-body angular momentum (simulation.py:353-358, the sign quirk
    reproduced by WalkConfig.hw_meas_negated) — so the waveform comparison
    is on |correlation|: the shape must match, the recorded orientation is
    reflected."""
    ref = np.loadtxt(CUHW)[:500]
    ours = walk500.hw[:500]

    # scale: same order of magnitude, not exceeding 2x the reference peak
    ref_max = np.linalg.norm(ref, axis=1).max()
    ours_max = np.linalg.norm(ours, axis=1).max()
    assert 0.3 * ref_max < ours_max < 2.0 * ref_max, (ours_max, ref_max)

    # waveform: the roll-axis (x) momentum — the single-support tipping
    # cycle that dominates both traces — must correlate strongly once the
    # walk is stepping (ticks 200+)
    c = np.corrcoef(ours[200:, 0], ref[200:500, 0])[0, 1]
    assert abs(c) > 0.5, c


def test_hw_des_scale_vs_reference(walk500):
    """MPC-predicted h_w (our hw_des trace vs the reference's hw_des.txt)
    stays within a small factor of the reference controller's predictions.
    The plants differ (centroidal abstraction vs DART articulation), so
    this is a band check, not a trajectory match."""
    ref = np.loadtxt(HW_DES)[:500]
    ours = walk500.hw_des[:500]
    ref_max = np.linalg.norm(ref, axis=1).max()
    ours_max = np.linalg.norm(ours, axis=1).max()
    assert ours_max < 3.0 * ref_max, (ours_max, ref_max)
    # and the prediction is not degenerate (the MPC does plan momentum)
    assert ours_max > 0.1 * ref_max, (ours_max, ref_max)


def test_commanded_feet_structure_vs_reference_dump(walk500):
    """Configuration-independent structure of the commanded foot poses vs
    the reference's closed-loop dump (see module docstring for why exact
    x-parity is not assertable from this artifact):

    * identical initial sole poses (the DEFAULT_FOOT_Y geometry),
    * flat-orientation swing (ang == 0 throughout, both controllers),
    * identical swing apex height (the 0.02 m quartic bump,
      foot_trajectory_generator.py:74-90).
    """
    refL, refR = _load_pose_dump(CONTACT_TRJ)
    oursL, oursR = walk500.pose_l, walk500.pose_r

    # initial poses match to float precision
    np.testing.assert_allclose(oursL[0], refL[0], atol=1e-7)
    np.testing.assert_allclose(oursR[0], refR[0], atol=1e-7)

    # both controllers command flat feet for the whole walk
    assert np.abs(refL[:, :2]).max() < 1e-12   # reference ang_x, ang_y
    assert np.abs(oursL[:, :2]).max() < 1e-12

    # swing apex: same quartic bump height (sampled at 10 ms it peaks just
    # under the 0.02 m step_height in both)
    apex_ref = max(refL[:, 5].max(), refR[:, 5].max())
    apex_ours = max(oursL[:, 5].max(), oursR[:, 5].max())
    assert abs(apex_ref - apex_ours) < 2e-3, (apex_ours, apex_ref)

    # lateral geometry: both walks keep the feet on the +-0.1 m tracks
    # (the dump's gait timing differs; the track lines do not)
    for ours, ref in ((oursL, refL), (oursR, refR)):
        assert abs(np.median(ours[:, 4]) - np.median(ref[:, 4])) < 5e-3


def test_reference_artifacts_present():
    """The parity oracles this suite depends on exist and have the
    documented shapes."""
    assert np.loadtxt(CUHW).shape == (1962, 3)
    assert np.loadtxt(HW_DES).shape == (1962, 3)
    L, R = _load_pose_dump(CONTACT_TRJ)
    assert L.shape == (2500, 6) and R.shape == (2500, 6)
