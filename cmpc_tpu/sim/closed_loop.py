"""Closed-loop rollout: planner -> MPC -> plant, as one `lax.scan`.

The functional re-design of the reference's customPreStep control loop
(simulation.py:193-301) — 2,000 ticks of {measure, solve MPC, interpolate
swing feet, integrate plant, adapt footsteps} as a single jitted scan that
vmaps over scenario batches and shards over device meshes.

The footstep-adaptation feedback (centroidal_mpc_vertices.py:656-675) —
the one place where the reference mutates the plan — becomes a masked
dynamic update of the carried plan-position tensor at statically known
event ticks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cmpc_tpu.config import Scenario, WalkConfig
from cmpc_tpu.models import centroidal as cm
from cmpc_tpu.ocp import assemble, problem
from cmpc_tpu.ops import sqp
from cmpc_tpu.plan import com_ref as com_ref_mod
from cmpc_tpu.plan import footsteps, swing, timing as timing_mod
from cmpc_tpu.sim.plant import PlantState, plant_step


class LoopCarry(NamedTuple):
    plant: PlantState
    plan_pos: jnp.ndarray         # (S, 3) live footstep positions
    theta_hat: jnp.ndarray        # (3,) MPC's carried disturbance estimate
    solver: sqp.SolverState


class Trace(NamedTuple):
    """Per-tick recorded quantities — the union of what the reference's four
    Logger classes and debug dumps capture (SURVEY.md §2.1 L5)."""

    com_pos: jnp.ndarray       # plant CoM position
    com_vel: jnp.ndarray
    com_pos_des: jnp.ndarray   # MPC node-1 CoM (the reference's `desired`)
    com_acc_des: jnp.ndarray   # force-balance CoM acceleration
    com_ref: jnp.ndarray       # spline reference
    hw: jnp.ndarray            # plant angular momentum
    hw_des: jnp.ndarray        # MPC node-1 angular momentum
    theta_hat: jnp.ndarray
    pose_l: jnp.ndarray        # commanded foot poses [ang, pos]
    pose_r: jnp.ndarray
    forces: jnp.ndarray        # (24,) stage-0 vertex forces
    mpc_contact_l: jnp.ndarray  # MPC node-1 left contact position
    mpc_contact_r: jnp.ndarray
    r_prim: jnp.ndarray
    lyap_violation: jnp.ndarray
    adapted: jnp.ndarray       # bool: footstep adaptation fired this tick
    x0: jnp.ndarray            # (20,) the measured state the MPC solved from
    #   (recorded so the bench can replay production solves verbatim:
    #    tools/record_walk_states.py -> assets/walk_x0.npz -> bench.py)


def rollout(scenario: Scenario, cfg: WalkConfig, T_sim: int | None = None,
            return_tick: bool = False, t0=0, carry_in: LoopCarry = None):
    """Run one scenario closed loop for T_sim ticks. Fully jittable; vmap
    over a batched Scenario for scenario sweeps.

    return_tick=True returns (carry0, tick_fn) instead of scanning —
    used by diagnostics to step the loop manually.

    t0/carry_in: resume from tick t0 with a previously returned carry —
    lets callers CHUNK a long walk across several dispatches (the
    tunneled-TPU runtime kills the worker on a single ~2,000-iteration
    scan program; tools/run_sweep.py runs full walks as chunked
    dispatches carrying LoopCarry between them)."""
    timing = timing_mod.build_timing(cfg)
    if T_sim is None:
        # the reference simulates num_steps/world_time_step ticks
        # (gen_pos_contacts_ref_at_time, footstep_planner_vertices.py:109)
        T_sim = cfg.num_steps * (cfg.ss_duration + cfg.ds_duration)

    plan0 = footsteps.plan_footsteps(scenario.vref, cfg, timing,
                                     scenario.foot_y,
                                     scenario.step_y_offset)
    pose_ref_l, pose_ref_r = footsteps.contact_pose_refs(plan0, timing)
    cref = com_ref_mod.build_com_ref(plan0, cfg, timing, scenario.foot_y)
    refs = assemble.RefArrays(com=cref, pose_ref_l=pose_ref_l,
                              pose_ref_r=pose_ref_r)
    polygon = cm.foot_polygon(cfg.foot_length, cfg.foot_width)

    # static tables as device constants
    gamma_l_tbl = jnp.asarray(timing.gamma_l)
    gamma_r_tbl = jnp.asarray(timing.gamma_r)
    update_event = jnp.asarray(timing.update_event)
    adapt_target = jnp.asarray(timing.adapt_target)
    support_is_left_tbl = jnp.asarray(
        timing.foot_is_left)[jnp.asarray(timing.step_idx)]

    x0_init = jnp.zeros(20)
    x0_init = x0_init.at[cm.P_COM].set(scenario.init_com)
    x0_init = x0_init.at[cm.V_COM].set(scenario.init_vel)

    # zero members derive from scenario leaves so their device-varying
    # type matches the tick outputs under shard_map's vma check
    zero3 = 0.0 * scenario.init_com
    carry0 = LoopCarry(
        plant=PlantState(com_pos=scenario.init_com,
                         com_vel=scenario.init_vel,
                         hw=zero3),
        plan_pos=plan0.pos,
        theta_hat=zero3,
        solver=sqp.init_solver_state(cfg, x0_init, mass=scenario.mpc_mass),
    )

    def tick(carry: LoopCarry, t):
        plan = footsteps.FootstepPlan(pos=carry.plan_pos, yaw=plan0.yaw)
        feet = swing.feet_ref_at(t, plan, cfg, timing, scenario.foot_y)

        x0 = assemble.pack_x0(carry.plant.com_pos, carry.plant.com_vel,
                              carry.plant.hw, carry.theta_hat,
                              feet.pose_l, feet.pose_r,
                              t, plan, refs, timing, cfg)
        params = assemble.gather_params(t, x0, refs, timing, cfg,
                                        scenario.k1, scenario.k2,
                                        scenario.mpc_mass)

        solver, info = sqp.solve_mpc(carry.solver, params, cfg)
        X, U = problem.split_z(solver.z, cfg)
        x1, u0 = X[1], U[0]

        # CoM acceleration from the force balance
        # (centroidal_mpc_vertices.py:633-636)
        sum_f = (u0[0:12].reshape(4, 3).sum(0) * params.gamma_l[0]
                 + u0[12:24].reshape(4, 3).sum(0) * params.gamma_r[0])
        com_acc_des = sum_f / scenario.mpc_mass + jnp.array(
            [0.0, 0.0, -cfg.g])

        # footstep adaptation: write the MPC's terminal swing-foot position
        # into the live plan at event ticks
        support_is_left = support_is_left_tbl[t]
        new_contact = jnp.where(support_is_left, X[cfg.N, cm.POS_R],
                                X[cfg.N, cm.POS_L])
        do_adapt = update_event[t] & jnp.asarray(cfg.update_contact)
        tgt = adapt_target[t]
        plan_pos = jnp.where(
            do_adapt,
            carry.plan_pos.at[tgt].set(new_contact),
            carry.plan_pos)

        # disturbance window (simulation.py:195-198: t > start and t < end)
        pushing = (t > scenario.push_start) & (t < scenario.push_end)
        ext_f = jnp.where(pushing, scenario.push_force, jnp.zeros(3))
        ext_tau = jnp.where(pushing, scenario.push_torque, jnp.zeros(3))

        # payload drop event (simulation_payload.py + box.urdf:79-83): the
        # plant gains payload_mass at the onset tick, with a one-tick
        # downward impact impulse m_p * v_impact (momentum transfer of the
        # free-falling box)
        has_payload = t >= scenario.payload_onset
        eff_mass = scenario.plant_mass \
            + jnp.where(has_payload, scenario.payload_mass, 0.0)
        impact = (t == scenario.payload_onset) & (scenario.payload_mass > 0)
        f_impact = (scenario.payload_mass * scenario.payload_impact_vel
                    / cfg.world_time_step)
        ext_f = ext_f.at[2].add(jnp.where(impact, -f_impact, 0.0))

        plant = plant_step(carry.plant, x1[cm.P_COM], x1[cm.V_COM],
                           com_acc_des, u0, gamma_l_tbl[t], gamma_r_tbl[t],
                           feet.pose_l, feet.pose_r, scenario.mpc_mass,
                           eff_mass, ext_f, ext_tau, cfg.g,
                           polygon, cfg.world_time_step,
                           hw_compliance=cfg.plant_hw_compliance,
                           hw_shed=cfg.plant_hw_shed)

        trace = Trace(
            com_pos=carry.plant.com_pos, com_vel=carry.plant.com_vel,
            com_pos_des=x1[cm.P_COM], com_acc_des=com_acc_des,
            com_ref=refs.com.pos[t],
            hw=carry.plant.hw, hw_des=x1[cm.H_W],
            theta_hat=x1[cm.THETA],
            pose_l=feet.pose_l, pose_r=feet.pose_r,
            forces=u0[0:24],
            mpc_contact_l=x1[cm.POS_L], mpc_contact_r=x1[cm.POS_R],
            r_prim=info.r_prim, lyap_violation=info.lyap_violation,
            adapted=do_adapt, x0=x0,
        )

        new_carry = LoopCarry(plant=plant, plan_pos=plan_pos,
                              theta_hat=x1[cm.THETA], solver=solver)
        return new_carry, trace

    if carry_in is not None:
        carry0 = carry_in
    if return_tick:
        return carry0, tick
    carry, traces = jax.lax.scan(tick, carry0,
                                 jnp.asarray(t0) + jnp.arange(T_sim))
    return carry, traces
