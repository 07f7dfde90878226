"""Full-pipeline closed loop on the articulated robot:

    planner refs -> centroidal MPC -> swing interpolation -> whole-body ID
    -> joint torques -> whole-body contact plant

— the complete re-design of the reference's customPreStep control loop
(simulation.py:193-301) with the DART world replaced by the penalty-contact
plant (wholebody/plant.py) and IPOPT/OSQP by the SQP/ADMM kernels.  One
`lax.scan` over ticks; vmap over scenario batches.

The centroidal closed loop (sim/closed_loop.py) is the fast evaluation
path; this one exercises every layer including L0/L4 (SURVEY.md §1).

Status (2026-08-21, round 5): the pipeline walks through the initial
double support, the FIRST FULL STEP and its landing (tests/
test_wholebody_walk.py: err_xy 0.012 m at the t=270 touchdown, swing
apex tracked), then diverges during the second swing.  The round-4
hw-shedding hypothesis is REFUTED by experiment: zero/filtered/model
hw feedback and raised ID angular-task authority all diverge the same
way (hw_feedback/hw_feedback_scale knobs below were added for those
experiments and kept).  What the round-5 diagnostics established:

* the WB plant realizes the MPC's node-1 prediction to ~1e-4 m per
  tick ("exact execution"), and the controller itself is only
  marginally contractive in that regime — an ideal plant := node-1
  loop diverges at SOFT_MARGIN 2e-3 and is bounded (err ~0.05) at
  1e-2 (ocp/condense.py SOFT_MARGIN note; margin recalibrated);
* the divergence is seeded at the first touch-down: the landing
  impact leaves a ~0.15 m/s CoM velocity error (x0 diff vs the
  recorded centroidal walk, assets/walk_x0.npz) that the marginally
  contractive loop cannot reject before the next landing compounds it.

Next lever: soften the touch-down transfer (the plant's penalty
contact brakes the late-swing foot harder than DART's impulsive
contact) or absorb the velocity kick in the solve (impact-aware
warm start at the ds boundary).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cmpc_tpu.config import Scenario, WalkConfig
from cmpc_tpu.models import centroidal as cm
from cmpc_tpu.ocp import assemble, problem
from cmpc_tpu.ops import sqp
from cmpc_tpu.ops.admm import ADMMSettings
from cmpc_tpu.plan import com_ref as com_ref_mod
from cmpc_tpu.plan import footsteps, swing, timing as timing_mod
from cmpc_tpu.rbd import algorithms as rbd
from cmpc_tpu.rbd.urdf import RobotModel
from cmpc_tpu.wholebody import inverse_dynamics as wbid
from cmpc_tpu.wholebody import plant as wbplant
from cmpc_tpu.wholebody import setup as wbsetup
from cmpc_tpu.wholebody.state import WBState, retrieve_state, zmp_estimate


class WBLoopCarry(NamedTuple):
    plant: wbplant.WBPlantState
    plan_pos: jnp.ndarray
    theta_hat: jnp.ndarray
    solver: sqp.SolverState
    zmp: jnp.ndarray          # (3,) last contact-force ZMP estimate
    hw_model: jnp.ndarray     # (3,) MPC's own node-1 hw prediction
    hw_filt: jnp.ndarray      # (3,) low-passed measured hw


class WBTrace(NamedTuple):
    com_pos: jnp.ndarray
    com_vel: jnp.ndarray
    com_ref: jnp.ndarray
    com_pos_des: jnp.ndarray
    hw: jnp.ndarray
    hw_des: jnp.ndarray
    theta_hat: jnp.ndarray
    pose_l: jnp.ndarray       # measured sole poses [ang, pos]
    pose_r: jnp.ndarray
    tau: jnp.ndarray          # (nj,) commanded torques
    zmp: jnp.ndarray          # (3,) contact-force ZMP estimate
    r_prim_mpc: jnp.ndarray
    r_prim_id: jnp.ndarray
    adapted: jnp.ndarray
    x0: jnp.ndarray           # (20,) the measured state the MPC solved from


def rollout(model: RobotModel, scenario: Scenario, cfg: WalkConfig,
            T_sim: int | None = None,
            # rho_adapt=2: a FIXED rho silently UNDER-CONVERGES the ID
            # ADMM in a contact-state-dependent way (measured at the
            # captured t=238 single-support state: rho=10 stalls at
            # r_dual 0.43 with stance fz 5.9 N of the needed 394 N and
            # tau ~8 Nm -> the plant free-falls while every logged
            # residual looks healthy; rho=1 fixes that state but stalls
            # the t~190 late-double-support solves instead).  Two
            # residual-balanced rho updates (ops/admm.py rho_adapt)
            # converge every phase.
            id_settings: ADMMSettings = ADMMSettings(iters=90, rho=10.0,
                                                     pdas_rounds=2,
                                                     rho_adapt=2),
            contact: wbplant.ContactParams = wbplant.ContactParams(),
            substeps: int = 10,
            id_weights: dict | None = None,
            id_pos_gains: dict | None = None,
            id_vel_gains: dict | None = None,
            hw_feedback_scale: float = 1.0,
            hw_feedback: str = "measured",
            hw_filter_tau: float = 0.15):
    """Run the articulated robot closed loop for T_sim control ticks."""
    timing = timing_mod.build_timing(cfg)
    if T_sim is None:
        T_sim = cfg.num_steps * (cfg.ss_duration + cfg.ds_duration)

    plan0 = footsteps.plan_footsteps(scenario.vref, cfg, timing,
                                     scenario.foot_y)
    pose_ref_l, pose_ref_r = footsteps.contact_pose_refs(plan0, timing)
    cref = com_ref_mod.build_com_ref(plan0, cfg, timing, scenario.foot_y)
    refs = assemble.RefArrays(com=cref, pose_ref_l=pose_ref_l,
                              pose_ref_r=pose_ref_r)

    gamma_l_tbl = jnp.asarray(timing.gamma_l)
    gamma_r_tbl = jnp.asarray(timing.gamma_r)
    update_event = jnp.asarray(timing.update_event)
    adapt_target = jnp.asarray(timing.adapt_target)
    support_is_left_tbl = jnp.asarray(
        timing.foot_is_left)[jnp.asarray(timing.step_idx)]

    q0 = wbsetup.initial_q(model, settle=0.0012)
    plant0 = wbplant.WBPlantState(q=q0, qv=jnp.zeros(model.nv))
    st0 = retrieve_state(model, q0, jnp.zeros(model.nv))
    joint_pos_des = jnp.asarray(wbsetup.initial_qj(model))
    joint_sel = wbid.redundant_selection(model)

    x0_init = jnp.zeros(20)
    x0_init = x0_init.at[cm.P_COM].set(st0.com_pos)

    carry0 = WBLoopCarry(
        plant=plant0,
        plan_pos=plan0.pos,
        theta_hat=jnp.zeros(3),
        solver=sqp.init_solver_state(cfg, x0_init, mass=scenario.mpc_mass),
        zmp=jnp.zeros(3),
        hw_model=jnp.zeros(3),
        hw_filt=jnp.zeros(3))

    def tick(carry: WBLoopCarry, t):
        st = retrieve_state(model, carry.plant.q, carry.plant.qv)
        plan = footsteps.FootstepPlan(pos=carry.plan_pos, yaw=plan0.yaw)
        feet = swing.feet_ref_at(t, plan, cfg, timing, scenario.foot_y)

        # --- centroidal MPC on the measured state ---
        a_lp = cfg.world_time_step / hw_filter_tau
        hw_filt = carry.hw_filt + a_lp * (st.hw - carry.hw_filt)
        hw_fb = {"measured": st.hw, "model": carry.hw_model,
                 "filtered": hw_filt}[hw_feedback]
        x0 = assemble.pack_x0(st.com_pos, st.com_vel,
                              hw_feedback_scale * hw_fb,
                              carry.theta_hat, st.pose_l, st.pose_r,
                              t, plan, refs, timing, cfg)
        params = assemble.gather_params(t, x0, refs, timing, cfg,
                                        scenario.k1, scenario.k2,
                                        scenario.mpc_mass)
        solver, info = sqp.solve_mpc(carry.solver, params, cfg)
        X, U = problem.split_z(solver.z, cfg)
        x1, u0 = X[1], U[0]
        sum_f = (u0[0:12].reshape(4, 3).sum(0) * params.gamma_l[0]
                 + u0[12:24].reshape(4, 3).sum(0) * params.gamma_r[0])
        com_acc_des = sum_f / scenario.mpc_mass + jnp.array(
            [0.0, 0.0, -cfg.g])

        # --- task references (simulation.py:207-271) ---
        ang_avg = (feet.pose_l[0:3] + feet.pose_r[0:3]) / 2.0
        om_avg = (feet.vel_l[0:3] + feet.vel_r[0:3]) / 2.0
        al_avg = (feet.acc_l[0:3] + feet.acc_r[0:3]) / 2.0
        desired = wbid.WBDesired(
            pose_l=feet.pose_l, vel_l=feet.vel_l, acc_l=feet.acc_l,
            pose_r=feet.pose_r, vel_r=feet.vel_r, acc_r=feet.acc_r,
            com_pos=x1[cm.P_COM], com_vel=x1[cm.V_COM],
            com_acc=com_acc_des,
            torso_rotvec=ang_avg, torso_omega=om_avg, torso_alpha=al_avg,
            base_rotvec=ang_avg, base_omega=om_avg, base_alpha=al_avg,
            joint_pos=joint_pos_des)

        tau, id_res = wbid.joint_torques(
            model, carry.plant.q, carry.plant.qv, desired, st,
            contact_l=gamma_l_tbl[t], contact_r=gamma_r_tbl[t],
            joint_sel=joint_sel, foot_size=cfg.foot_size, mu=cfg.mu,
            settings=id_settings, weights=id_weights,
            pos_gains=id_pos_gains, vel_gains=id_vel_gains)

        # --- footstep adaptation (centroidal_mpc_vertices.py:656-675) ---
        support_is_left = support_is_left_tbl[t]
        new_contact = jnp.where(support_is_left, X[cfg.N, cm.POS_R],
                                X[cfg.N, cm.POS_L])
        do_adapt = update_event[t] & jnp.asarray(cfg.update_contact)
        plan_pos = jnp.where(
            do_adapt,
            carry.plan_pos.at[adapt_target[t]].set(new_contact),
            carry.plan_pos)

        # --- disturbance + plant step ---
        pushing = (t > scenario.push_start) & (t < scenario.push_end)
        ext_f = jnp.where(pushing, scenario.push_force, jnp.zeros(3))
        ext_tau = jnp.where(pushing, scenario.push_torque, jnp.zeros(3))

        # payload as a wrench transient on the articulated plant
        # (simulation_payload.py + box.urdf:79-83: a 2 kg box free-drops
        # onto the arms and rests there).  The resting box is a constant
        # downward force at the arms' body-frame offset ahead of the
        # base (=> a pitch torque); the drop itself is a one-tick impact
        # impulse m * v_impact / dt.  The MPC is NOT told (its mass model
        # stays nominal) — robustness comes from the adaptation law, as
        # in the reference.
        has_pl = (scenario.payload_mass > 0.0) \
            & (t >= scenario.payload_onset)
        w_pl = scenario.payload_mass * cfg.g
        f_imp = jnp.where(t == scenario.payload_onset,
                          scenario.payload_mass * scenario.payload_impact_vel
                          / cfg.world_time_step, 0.0)
        f_payload = jnp.where(has_pl,
                              jnp.array([0.0, 0.0, -1.0]) * (w_pl + f_imp),
                              jnp.zeros(3))
        # arm_offset is a BODY-frame arm position relative to the base,
        # crossed with the world-frame weight and applied as a world
        # torque: a small-tilt approximation (ADVICE r4) — exact only
        # while the base stays near-upright, which holds in the walking
        # envelope (|base pitch/roll| < ~0.1 rad); under large tilt the
        # pitch arm shortens by cos(tilt) and a roll component appears.
        # wb_plant_step applies ext_tau about the base origin in world
        # axes, matching this convention.
        arm_offset = jnp.array([0.15, 0.0, 0.15])   # arms rel. base (m)
        ext_f = ext_f + f_payload
        ext_tau = ext_tau + jnp.cross(arm_offset, f_payload)
        plant, (c_pts, c_forces) = wbplant.wb_plant_step(
            model, carry.plant, tau, ext_force=ext_f, ext_torque=ext_tau,
            dt=cfg.world_time_step, substeps=substeps, g=cfg.g, cp=contact,
            foot_length=cfg.foot_length, foot_width=cfg.foot_width,
            return_contacts=True)

        # contact-force ZMP estimate (simulation.py:328-348)
        zmp = zmp_estimate(c_pts, c_forces, st.com_pos, st.pose_l[3:6],
                           model.total_mass, cfg.g, cfg.h,
                           prev_zmp=carry.zmp)

        trace = WBTrace(
            com_pos=st.com_pos, com_vel=st.com_vel,
            com_ref=refs.com.pos[t], com_pos_des=x1[cm.P_COM],
            hw=st.hw, hw_des=x1[cm.H_W], theta_hat=x1[cm.THETA],
            pose_l=st.pose_l, pose_r=st.pose_r, tau=tau, zmp=zmp,
            r_prim_mpc=info.r_prim, r_prim_id=id_res.r_prim,
            adapted=do_adapt, x0=x0)

        # hw_model is stored in PLANT convention (pack_x0 re-negates per
        # the reference's measurement quirk), so "model" feedback mode
        # feeds the MPC exactly what it predicted for this tick
        sgn = -1.0 if cfg.hw_meas_negated else 1.0
        return WBLoopCarry(plant=plant, plan_pos=plan_pos,
                           theta_hat=x1[cm.THETA], solver=solver,
                           zmp=zmp, hw_model=sgn * x1[cm.H_W],
                           hw_filt=hw_filt), trace

    carry, traces = jax.lax.scan(tick, carry0, jnp.arange(T_sim))
    return carry, traces
