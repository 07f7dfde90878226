"""High-accuracy oracle solver for the centroidal MPC NLP (CPU, f64, scipy).

The reference solves its NLP with IPOPT (centroidal_mpc_vertices.py:126-130);
this repo's production path is the batched SQP/ADMM in ops/sqp.py.  This
module provides the *third* implementation — scipy SLSQP on the exact same
``ocp.problem`` cost/constraints in float64 — used as a convergence oracle:

* to validate the problem formulation independently of the SQP solver
  (if the oracle's closed loop walks, the formulation and plant are right);
* as a per-tick accuracy reference in tests (the SQP solution's cost and
  feasibility are compared against the oracle's).

Not jittable, not batched, CPU-only.  Requires ``jax_enable_x64``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import minimize

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.ocp import problem


@functools.lru_cache(maxsize=4)
def _fns(cfg: WalkConfig):
    cost = jax.jit(lambda z, p: problem.cost_value(z, p, cfg))
    grad = jax.jit(jax.grad(lambda z, p: problem.cost_value(z, p, cfg)))
    con = jax.jit(lambda z, p: problem.constraints(z, p, cfg))
    jac = jax.jit(lambda z, p: problem.linearize(z, p, cfg)[1])
    return cost, grad, con, jac


def solve_nlp(z0, params, cfg: WalkConfig, maxiter: int = 200,
              lyap_margin: float = 0.0):
    """Solve the MPC NLP to high accuracy with SLSQP. Returns (z, info dict).

    lyap_margin > 0 tightens the N Lyapunov-decrease rows by that amount
    (u_lyap -= margin) — the same tightening the production solver
    applies (ocp/condense.SOFT_MARGIN), so oracle and production solve
    the IDENTICAL problem and their costs are comparable.  The returned
    max_violation is measured against the tightened bounds.

    Constraint split: rows [0, n_eq) are equalities (init + dynamics); the
    rest are inequalities l <= c <= u from problem.constraint_bounds (only
    the stance-box rows have finite lower bounds).
    """
    assert jax.config.jax_enable_x64, "oracle requires f64"
    cost, grad, con, jac = _fns(cfg)
    l, u = problem.constraint_bounds(cfg)
    if lyap_margin:
        u = np.array(u, copy=True)
        n_eq0 = 20 * (cfg.N + 1)
        u[n_eq0:n_eq0 + cfg.N] -= lyap_margin
    n_eq = 20 * (cfg.N + 1)
    lo = np.asarray(l[n_eq:])
    hi = np.asarray(u[n_eq:])
    fin_lo = np.isfinite(lo)

    p = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, dtype=jnp.float64), params)

    def c_eq(z):
        return np.asarray(con(jnp.asarray(z), p)[:n_eq])

    def J_eq(z):
        return np.asarray(jac(jnp.asarray(z), p)[:n_eq])

    def c_ineq(z):
        c = np.asarray(con(jnp.asarray(z), p)[n_eq:])
        return np.concatenate([hi - c, (c - lo)[fin_lo]])

    def J_ineq(z):
        J = np.asarray(jac(jnp.asarray(z), p)[n_eq:])
        return np.concatenate([-J, J[fin_lo]])

    res = minimize(
        lambda z: float(cost(jnp.asarray(z), p)),
        np.asarray(z0, dtype=np.float64),
        jac=lambda z: np.asarray(grad(jnp.asarray(z), p)),
        method="SLSQP",
        constraints=[
            {"type": "eq", "fun": c_eq, "jac": J_eq},
            {"type": "ineq", "fun": c_ineq, "jac": J_ineq},
        ],
        options={"maxiter": maxiter, "ftol": 1e-10},
    )
    c = np.asarray(con(jnp.asarray(res.x), p))
    viol = float(np.maximum(c - u, 0.0).max() + np.maximum(l - c, 0.0).max())
    return res.x, {"success": res.success, "status": res.status,
                   "nit": res.nit, "cost": float(res.fun),
                   "max_violation": viol}


def rollout_oracle(scenario, cfg: WalkConfig, T_sim: int,
                   solver=None, verbose_every: int = 0,
                   t0: int = 0, init=None):
    """Eager (python-loop) closed-loop rollout driven by the oracle NLP.

    Mirrors sim/closed_loop.rollout's tick exactly — measured-state packing,
    footstep adaptation, centroidal plant — but calls `solver(z0, params)`
    (default: solve_nlp) instead of the batched SQP.  Returns a dict of
    stacked per-tick arrays.

    t0/init: start at tick t0 from a handed-off LoopCarry-like dict
    {"com_pos","com_vel","hw","plan_pos","theta_hat","z"} (e.g. the fast
    SQP loop's carry) — lets the oracle enter mid-walk without paying
    ~15 s/tick for the easy early phase.
    """
    from cmpc_tpu.models import centroidal as cm
    from cmpc_tpu.ocp import assemble
    from cmpc_tpu.ops import sqp
    from cmpc_tpu.plan import com_ref as com_ref_mod
    from cmpc_tpu.plan import footsteps, swing, timing as timing_mod
    from cmpc_tpu.sim.plant import PlantState, plant_step

    if solver is None:
        solver = lambda z0, p: solve_nlp(z0, p, cfg)  # noqa: E731

    timing = timing_mod.build_timing(cfg)
    plan0 = footsteps.plan_footsteps(scenario.vref, cfg, timing,
                                     scenario.foot_y)
    prl, prr = footsteps.contact_pose_refs(plan0, timing)
    cref = com_ref_mod.build_com_ref(plan0, cfg, timing, scenario.foot_y)
    refs = assemble.RefArrays(com=cref, pose_ref_l=prl, pose_ref_r=prr)
    polygon = cm.foot_polygon(cfg.foot_length, cfg.foot_width)

    if init is None:
        plant = PlantState(
            com_pos=jnp.asarray(scenario.init_com, jnp.float64),
            com_vel=jnp.asarray(scenario.init_vel, jnp.float64),
            hw=jnp.zeros(3, jnp.float64))
        plan_pos = jnp.asarray(plan0.pos, jnp.float64)
        theta_hat = jnp.zeros(3, jnp.float64)
        x0_init = jnp.zeros(20).at[cm.P_COM].set(scenario.init_com)
        z = jnp.asarray(
            sqp.init_solver_state(cfg, x0_init, mass=scenario.mpc_mass).z,
            jnp.float64)
    else:
        plant = PlantState(
            com_pos=jnp.asarray(init["com_pos"], jnp.float64),
            com_vel=jnp.asarray(init["com_vel"], jnp.float64),
            hw=jnp.asarray(init["hw"], jnp.float64))
        plan_pos = jnp.asarray(init["plan_pos"], jnp.float64)
        theta_hat = jnp.asarray(init["theta_hat"], jnp.float64)
        z = jnp.asarray(init["z"], jnp.float64)

    out = {k: [] for k in ("com_pos", "com_ref", "com_des", "hw", "hw_des",
                           "theta_hat", "max_violation", "cost", "success")}
    for t in range(t0, t0 + T_sim):
        plan = footsteps.FootstepPlan(pos=plan_pos, yaw=plan0.yaw)
        feet = swing.feet_ref_at(t, plan, cfg, timing, scenario.foot_y)
        x0 = assemble.pack_x0(plant.com_pos, plant.com_vel, plant.hw,
                              theta_hat, feet.pose_l, feet.pose_r,
                              t, plan, refs, timing, cfg)
        params = assemble.gather_params(t, x0, refs, timing, cfg,
                                        scenario.k1, scenario.k2,
                                        scenario.mpc_mass)
        # rebase warm start on the new x0 (cheap; keeps SLSQP fast)
        z = np.array(z, dtype=np.float64)
        z[:20] = np.asarray(x0)
        z, info = solver(z, params)
        X, U = problem.split_z(jnp.asarray(z), cfg)
        x1, u0 = X[1], U[0]
        sum_f = (u0[0:12].reshape(4, 3).sum(0) * params.gamma_l[0]
                 + u0[12:24].reshape(4, 3).sum(0) * params.gamma_r[0])
        com_acc_des = sum_f / scenario.mpc_mass + jnp.array(
            [0.0, 0.0, -cfg.g])

        support_is_left = bool(
            timing.foot_is_left[timing.step_idx[t]])
        new_contact = x1[cm.POS_R] if support_is_left else x1[cm.POS_L]
        new_contact = jnp.where(support_is_left, X[cfg.N, cm.POS_R],
                                X[cfg.N, cm.POS_L])
        if bool(timing.update_event[t]) and cfg.update_contact:
            plan_pos = plan_pos.at[int(timing.adapt_target[t])].set(
                new_contact)

        pushing = (t > int(scenario.push_start)) and \
            (t < int(scenario.push_end))
        ext_f = jnp.asarray(scenario.push_force) if pushing else jnp.zeros(3)
        ext_tau = (jnp.asarray(scenario.push_torque) if pushing
                   else jnp.zeros(3))
        out["com_pos"].append(np.asarray(plant.com_pos))
        out["com_ref"].append(np.asarray(refs.com.pos[t]))
        out["com_des"].append(np.asarray(x1[cm.P_COM]))
        out["hw"].append(np.asarray(plant.hw))
        out["hw_des"].append(np.asarray(x1[cm.H_W]))
        out["theta_hat"].append(np.asarray(theta_hat))
        out["max_violation"].append(info.get("max_violation", np.nan))
        out["cost"].append(info.get("cost", np.nan))
        out["success"].append(info.get("success", True))

        plant = plant_step(plant, x1[cm.P_COM], x1[cm.V_COM], com_acc_des,
                           u0, float(timing.gamma_l[t]),
                           float(timing.gamma_r[t]),
                           feet.pose_l, feet.pose_r, scenario.mpc_mass,
                           scenario.plant_mass, ext_f, ext_tau, cfg.g,
                           polygon, cfg.world_time_step,
                           hw_compliance=cfg.plant_hw_compliance,
                           hw_shed=cfg.plant_hw_shed)
        theta_hat = x1[cm.THETA]
        if verbose_every and t % verbose_every == 0:
            err = np.abs(out["com_pos"][-1][:2] - out["com_ref"][-1][:2])
            print(f"t={t} err={err.max():.4f} viol="
                  f"{out['max_violation'][-1]:.2e} nit={info.get('nit')}",
                  flush=True)
    return {k: np.asarray(v) for k, v in out.items()}
