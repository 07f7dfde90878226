"""IS-MPC legacy baseline closed loop: LIP plant + Kalman filter + IS-MPC.

The functional equivalent of original_code/simulation.py:133-193 with the
DART robot replaced by the LIP plant itself (the model the controller
assumes): per tick {KF predict on last ZMP command, KF update on noisy
measurement, IS-MPC solve, integrate plant}.  One `lax.scan`, vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cmpc_tpu.config import WalkConfig, default_vref, DEFAULT_FOOT_Y
from cmpc_tpu.models.lip import lip_dynamics
from cmpc_tpu.ops import ismpc, kalman
from cmpc_tpu.plan import footsteps, timing as timing_mod


class ISMPCTrace(NamedTuple):
    com_pos: jnp.ndarray
    com_vel: jnp.ndarray
    zmp_pos: jnp.ndarray   # plant (true) ZMP
    zmp_des: jnp.ndarray   # MPC node-1 ZMP
    com_flt: jnp.ndarray   # Kalman-filtered CoM


class ISMPCCarry(NamedTuple):
    x: jnp.ndarray          # (9,) true LIP plant state
    kf: kalman.KalmanState
    solver: ismpc.ISMPCState
    u_prev: jnp.ndarray     # (3,) last commanded zmp velocity


def run(T_sim: int = 500, cfg: WalkConfig | None = None,
        icfg: ismpc.ISMPCConfig | None = None, noise_std: float = 0.0,
        seed: int = 0):
    """Closed-loop IS-MPC walk. Returns (carry, ISMPCTrace)."""
    cfg = cfg or WalkConfig()
    icfg = icfg or ismpc.ISMPCConfig(eta=cfg.eta, g=cfg.g,
                                     foot_size=cfg.foot_size,
                                     delta=cfg.world_time_step)
    timing = timing_mod.build_timing(cfg)
    vref = jnp.asarray(default_vref(cfg.num_steps), jnp.float32)
    plan = footsteps.plan_footsteps(vref, cfg, timing,
                                    jnp.asarray(DEFAULT_FOOT_Y))

    km = kalman.lip_kalman_model(icfg.eta, icfg.delta)
    x0 = jnp.array([0.0, 0.0, 0.0,
                    0.0, 0.0, 0.0,
                    cfg.h, 0.0, 0.0])
    carry0 = ISMPCCarry(
        x=x0,
        kf=kalman.KalmanState(x=x0, P=jnp.eye(9)),
        solver=ismpc.init_state(icfg),
        u_prev=jnp.zeros(3))

    ss = np.asarray(timing.ss, np.float64)
    ds = np.asarray(timing.ds, np.float64)
    start = np.asarray(timing.start, np.float64)
    keys = jax.random.split(jax.random.PRNGKey(seed), T_sim)

    def tick(carry: ISMPCCarry, inp):
        t, key = inp
        # KF: predict on last command, update on (noisy) measurement
        kf = kalman.predict(km, carry.kf, carry.u_prev)
        meas = carry.x + noise_std * jax.random.normal(key, (9,))
        kf = kalman.update(km, kf, meas)

        mc_x, mc_y, mc_z = ismpc.moving_constraint(
            t, plan.pos, ss, ds, start,
            jnp.array([0.0, 0.0]), icfg)
        solver, (com_pos, com_vel, com_acc, zmp_pos, u0) = ismpc.solve(
            carry.solver, kf.x, mc_x, mc_y, mc_z, icfg)

        # integrate the true LIP plant under the ZMP-velocity command.
        # The z block of the LIP is an *unstable* equilibrium
        # (z'' = eta^2 (z - z_zmp) - g); in the reference the plant is DART,
        # whose ground contact holds the height physically
        # (original_code/simulation.py), so the evaluation plant pins
        # com_z = h / vel_z = 0 and only x/y evolve as a true LIP.
        xdot = lip_dynamics(carry.x, u0, icfg.eta, icfg.g)
        x_new = carry.x + icfg.delta * xdot
        x_new = x_new.at[6].set(cfg.h).at[7].set(0.0)

        trace = ISMPCTrace(
            com_pos=carry.x[jnp.asarray([0, 3, 6])],
            com_vel=carry.x[jnp.asarray([1, 4, 7])],
            zmp_pos=carry.x[jnp.asarray([2, 5, 8])],
            zmp_des=zmp_pos,
            com_flt=kf.x[jnp.asarray([0, 3, 6])])
        return ISMPCCarry(x=x_new, kf=kf, solver=solver, u_prev=u0), trace

    return jax.lax.scan(tick, carry0,
                        (jnp.arange(T_sim), keys))
