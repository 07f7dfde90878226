"""Configuration for the TPU-native centroidal MPC framework.

Two kinds of configuration exist, mirroring the split between what is static at
trace/compile time and what is batched per scenario:

* :class:`WalkConfig` — a frozen, hashable dataclass of *static* gait/problem
  structure (horizon length, step durations, solver iteration caps).  Passed as
  a static argument to ``jax.jit``; changing it triggers recompilation.

* :class:`Scenario` — a pytree of arrays holding everything that varies per
  batched scenario (gains, masses, disturbance wrenches, velocity commands).
  ``vmap``/``shard_map`` map over its leading axis.

The numeric defaults reproduce the reference controller's configuration
(``/root/reference/code/simulation.py:24-44`` params dict and
``centroidal_mpc_vertices.py:27-60`` gains/foot geometry).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

# Initial foot poses of the HRP-4 model after the reference's initial joint
# configuration is applied and the robot is centered on the ground
# (simulation.py:63-77).  The lateral sole offset is a property of the URDF
# kinematics; recorded from the reference's debug traces
# (code/Debug/"Pos Lfoot pre trj" row 0).
DEFAULT_FOOT_Y = 0.10163857612916291


@dataclasses.dataclass(frozen=True)
class WalkConfig:
    """Static problem structure. Hashable: usable as a jit static argument.

    Mirrors the reference ``params`` dict (simulation.py:24-44) plus the MPC
    gains that live inline in centroidal_mpc_vertices.py:27-31.
    """

    g: float = 9.81
    h: float = 0.72                  # CoM height reference (m)
    foot_size: float = 0.1           # used by the whole-body ID CoP box
    step_height: float = 0.02        # swing apex (m)
    world_time_step: float = 0.01    # control tick (s)
    ss_duration: int = 70            # single-support ticks
    ds_duration: int = 30            # double-support ticks
    first_swing: str = "rfoot"       # foot_id of plan[0] (the dummy step)
    mu: float = 0.5                  # friction coefficient
    N: int = 10                      # MPC horizon nodes
    mpc_rate: int = 1                # solve every `mpc_rate` ticks
    num_steps: int = 20              # number of footsteps (== len(vref))
    update_contact: bool = True      # online footstep adaptation on/off
    com_z_max: float = 0.76          # CoM height ceiling (MPC constraint)
    knot_y_scale: float = 0.6        # lateral CoM knot shrink factor
    # The reference samples spline velocity as dY/dtau (no time scaling) and
    # acceleration as d2Y/dtau2 / ticks^2 (functions.py:212-248).  On the
    # 100-tick segments (1 s) velocity happens to coincide with m/s, but on
    # the 200-tick first segment it is 2x too large — the backstepping z2
    # then chases an infeasible lateral velocity and the robot capsizes
    # during the long initial double support.  True selects physically
    # consistent units (identical to the reference on all 1 s segments);
    # False reproduces the reference bit-for-bit.
    physical_ref_units: bool = True
    # Foot polygon (centroidal MPC contact model),
    # centroidal_mpc_vertices.py:51-60.
    foot_length: float = 0.25
    foot_width: float = 0.13
    # Stance-foot deviation box around reference (x, y, z half-widths),
    # centroidal_mpc_vertices.py:258-271.
    stance_box: tuple = (0.01, 0.005, 0.00005)
    # --- solver structure (new capability; no reference equivalent) ---
    # "condip": condensed single-shooting SQP with a dense Mehrotra
    # interior-point inner QP (ops/pdip.py) — the high-accuracy production
    # path.  "admm": sparse SQP over [X, U] with the OSQP-style ADMM+PDAS
    # inner QP (ops/admm.py).
    mpc_solver: str = "condip"
    # 8 IPM iterations / 1 refinement pass: the closed-loop requirement
    # re-measured in round 5 over the 500-tick walk (max err 0.0298 m at
    # 8 iters vs 0.0286 at 11, r_prim p50 1.2e-3 vs 1.4e-3) at ~1.35x
    # the throughput; 11 was the r4 setting, kept validated in
    # tools/_dev scripts.  sqp_iters stays 6: 5 costs err 0.034 and
    # r_prim max 0.26, 4 costs 0.041 — too close to the 0.05 walking
    # envelope (tests/test_full_walk.py).
    pdip_iters: int = 8              # interior-point iterations per QP
    pdip_refine: int = 1             # iterative-refinement passes / solve
    condip_prox: float = 0.1         # proximal damping on dU (condip path)
    # Lyapunov/momentum rows as elastic (slack + penalty) rows.  False =
    # hard rows like the reference's IPOPT problem; an infeasible
    # subproblem then yields a garbage step that the merit line search
    # rejects (alpha = 0), which is the failure-containment path.
    condip_soft: bool = False
    # 3 SQP iterations (round-5 recalibration): with the Lyapunov-row
    # margin at its corrected value (ocp/condense.SOFT_MARGIN 1e-2,
    # which restores closed-loop contraction the solver itself used to
    # owe to plant dissipation), the full 2,100-tick walk is CLEAN at
    # 3 iterations (walk err 0.0244 m, stop 0.109, hw 2.81/4.72,
    # r_prim p50 4.3e-3) and even at 2 (0.0234/0.108, hw 2.79/3.97 —
    # the walk-validated latency configuration).  The r4 requirement of
    # 6 (at margin 2e-3: 3 iters left r_prim ~0.4 landing violations
    # that felled the walk by step 6-7) no longer binds — the margin,
    # not the iteration count, was carrying the closed loop.
    sqp_iters: int = 3               # SQP (real-time iteration) count per solve
    sqp_prox: float = 20.0           # proximal damping of each SQP QP
    admm_iters: int = 20             # ADMM iterations per QP (before PDAS)
    admm_rho: float = 0.1
    admm_sigma: float = 1e-6
    admm_alpha: float = 1.6          # over-relaxation
    # matmul-only normal-equations ADMM: the MPC QP's scaled normal matrix
    # is f32-friendly, so the MXU fast path applies (ops/admm.py)
    admm_kkt_form: bool = False
    # stage-structured (block-tridiagonal) linear solves inside the MPC
    # ADMM/PDAS — the OCP fast path (ops/blocktri.py); dense otherwise
    mpc_blocktri: bool = True
    # --- centroidal plant calibration (sim/plant.py; the {ID + DART}
    # abstraction).  Compliance: fraction of the out-of-polygon moment
    # demand that materializes as centroidal angular momentum growth (the
    # articulated robot absorbs the rest in posture deviation); shed: the
    # effective rate (1/s) at which the whole-body controller's angular
    # tasks bleed hw when the CoP has room.  Calibrated against
    # original_code/cuhw.txt (see sim/plant.py).
    # shed 3.0 (vs the 1.3 the ds-decay alone suggests) is what makes the
    # closed loop settle into a periodic gait: at 1.3 a lateral
    # once-per-gait-cycle oscillation grows slowly (~x1.2/step from step
    # 10) and fells the walk at step ~13; at 3.0 the 1,400-tick run is
    # periodic (err max 0.031 m, |hw| cycling 1.35 <-> 0.22).
    plant_hw_compliance: float = 0.35
    plant_hw_shed: float = 3.0
    # Angular-momentum measurement sign: the reference's retrieve_state
    # NEGATES the whole-body angular momentum it feeds to the MPC
    # (simulation.py:357-358, `-w_R_link_i @ body.getAngularMomentum(...)`).
    # This quirk is LOAD-BEARING: under the reflection, the physically
    # unavoidable single-support tipping torque (CoM outside the support
    # polygon => h_w must grow) always appears to SHRINK the measured
    # momentum, so the momentum cap |hw_1| <= |hw_0|
    # (centroidal_mpc_vertices.py:222-224) never becomes infeasible.  With
    # the physically-signed measurement the NLP goes mildly infeasible from
    # mid-single-support (measured: lyap+momentum jointly infeasible by
    # 5e-4 at tick 243 growing to 1.3e-2 by 250, trust-constr f64; with
    # the flip the same NLP solves to 5e-10 violation at 25x lower cost) —
    # the root cause of the round-1/2 first-landing divergence.  The
    # reference's own traces confirm its measured hw is reflected: mid-ss
    # its hw_x DECREASES (original_code/cuhw.txt) while the physical
    # tipping moment is positive.  True reproduces the reference.
    hw_meas_negated: bool = True
    # x0 swing-foot source: True packs the swing foot's measured position
    # (the commanded swing trajectory) into x0; False reproduces the
    # reference's take-off pin + landing-tick teleport
    # (centroidal_mpc_vertices.py:493-509).  See ocp/assemble.pack_x0.
    x0_swing_from_traj: bool = True
    # elastic (slack-relaxed) Lyapunov rows in the SQP subproblem.
    # Experimental: guarantees subproblem feasibility but measurably
    # degrades closed-loop tracking (the slack lets the QP trade the
    # stability constraint against cost every tick); default off.
    sqp_elastic: bool = False

    @property
    def eta(self) -> float:
        return float(np.sqrt(self.g / self.h))

    @property
    def delta(self) -> float:
        """MPC discretization step (centroidal_mpc_vertices.py:11)."""
        return self.world_time_step * self.mpc_rate

    @property
    def total_ticks(self) -> int:
        """Walk length in control ticks: step 0 lasts ss0+ds0 = 2*(ss+ds),
        every other step ss+ds (footstep_planner_vertices.py:28-31)."""
        scale = self.ss_duration + self.ds_duration
        return 2 * scale + (self.num_steps - 1) * scale

    @property
    def pad_ticks(self) -> int:
        """Reference-array length: walk + horizon lookahead + margin."""
        return self.total_ticks + (self.N + 2) * self.mpc_rate + 8

    # dims of the OCP decision variables
    @property
    def n_x(self) -> int:
        return 20

    @property
    def n_u(self) -> int:
        return 32

    @property
    def n_z(self) -> int:
        return self.n_x * (self.N + 1) + self.n_u * self.N


def default_vref(num_steps: int = 20) -> np.ndarray:
    """The reference's velocity-command script (simulation.py:97), one
    (vx, vy, omega) command per footstep."""
    cmds = ([(0.15, 0.0, 0.0)] * 11 + [(0.13, 0.0, 0.0)] * 4
            + [(0.10, 0.0, 0.0)] * 2 + [(0.0, 0.0, 0.0)] * 3)
    out = np.array(cmds, dtype=np.float64)
    if num_steps != 20:
        if num_steps < 20:
            out = out[:num_steps]
        else:
            out = np.vstack([out, np.tile(out[-1], (num_steps - 20, 1))])
    return out


class Gains(NamedTuple):
    """Backstepping gains of the change of coordinates (paper §III;
    centroidal_mpc_vertices.py:27-31). Arrays so they batch per scenario."""

    k1: jnp.ndarray  # () or (B,)
    k2: jnp.ndarray


class Scenario(NamedTuple):
    """Per-scenario batched parameters. Every leaf has a leading batch axis
    when used under vmap (scalars shown as their unbatched shapes).

    The reference has exactly one hard-coded scenario (flat walk + lateral
    push, simulation.py:195-198) and one payload variant; here scenarios are
    data.
    """

    k1: jnp.ndarray                # () backstepping gain
    k2: jnp.ndarray                # ()
    mpc_mass: jnp.ndarray          # () mass the MPC model believes (kg)
    plant_mass: jnp.ndarray        # () true plant mass (payload => heavier)
    push_force: jnp.ndarray        # (3,) external force (N)
    push_torque: jnp.ndarray       # (3,) external torque about CoM (N m)
    push_start: jnp.ndarray        # () tick where the push starts
    push_end: jnp.ndarray          # () tick where the push ends
    vref: jnp.ndarray              # (S, 3) unicycle velocity commands
    init_com: jnp.ndarray          # (3,) initial CoM position
    init_vel: jnp.ndarray          # (3,) initial CoM velocity
    foot_y: jnp.ndarray            # () initial lateral sole offset
    # --- payload as a dynamic event (simulation_payload.py + box.urdf):
    # the plant gains `payload_mass` kg at tick `payload_onset`, with a
    # one-tick downward impact impulse payload_mass * payload_impact_vel
    # (the box free-falls onto the arms).  payload_mass = 0 disables.
    payload_mass: jnp.ndarray = jnp.asarray(0.0)       # () kg
    payload_onset: jnp.ndarray = jnp.asarray(0)        # () tick
    payload_impact_vel: jnp.ndarray = jnp.asarray(0.0)  # () m/s at impact
    # lateral footstep offset (the reference's hard-coded +-0.1 m,
    # footstep_planner_vertices.py:33-36) — scenario data so step-geometry
    # sweeps batch (BASELINE.json config 4)
    step_y_offset: jnp.ndarray = jnp.asarray(0.1)      # () m


def nominal_scenario(cfg: WalkConfig, mass: float = 40.05,
                     push: tuple = (0.0, 3.0, 0.0),
                     push_window: tuple = (801, 899)) -> Scenario:
    """The reference flat-ground walk: 20 steps, lateral 3 N push for
    t in (800, 900) (simulation.py:195-198)."""
    return Scenario(
        k1=jnp.asarray(4.0),
        k2=jnp.asarray(0.1),
        mpc_mass=jnp.asarray(mass),
        plant_mass=jnp.asarray(mass),
        push_force=jnp.asarray(push, dtype=jnp.float32),
        push_torque=jnp.zeros(3, dtype=jnp.float32),
        push_start=jnp.asarray(push_window[0]),
        push_end=jnp.asarray(push_window[1]),
        vref=jnp.asarray(default_vref(cfg.num_steps), dtype=jnp.float32),
        init_com=jnp.asarray([0.0, 0.0, cfg.h], dtype=jnp.float32),
        init_vel=jnp.zeros(3, dtype=jnp.float32),
        foot_y=jnp.asarray(DEFAULT_FOOT_Y),
    )


def payload_scenario(cfg: WalkConfig, mass: float = 40.05,
                     payload_mass: float = 2.0,
                     onset_tick: int = 0,
                     drop_height: float = 0.1) -> Scenario:
    """The payload variant: a 2 kg box dropped onto the robot's arms
    (box.urdf:14,79-83) — a mass step at `onset_tick` plus the free-fall
    impact impulse (v = sqrt(2 g h_drop)); the MPC keeps its nominal mass
    model, gains k1=7, k2=1 (centroidal_mpc_vertices_payload.py:27-31)."""
    base = nominal_scenario(cfg, mass=mass, push=(0.0, 0.0, 0.0),
                            push_window=(0, 0))
    return base._replace(
        k1=jnp.asarray(7.0),
        k2=jnp.asarray(1.0),
        payload_mass=jnp.asarray(payload_mass),
        payload_onset=jnp.asarray(onset_tick),
        payload_impact_vel=jnp.asarray(
            float(np.sqrt(2.0 * cfg.g * drop_height))),
    )
