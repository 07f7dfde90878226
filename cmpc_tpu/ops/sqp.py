"""SQP (real-time-iteration) wrapper around the ADMM QP kernel.

Replaces the per-tick IPOPT solve of the reference
(centroidal_mpc_vertices.py:605-611).  The MPC cost is exactly quadratic
(ocp/problem.cost_quadratic); only the dynamics, Lyapunov and momentum
constraints are nonlinear, so each SQP iteration linearizes the stacked
constraint vector with jacfwd and solves one convex QP.  A fixed number of
iterations (cfg.sqp_iters) with primal/dual warm starting across control
ticks — the same warm-start strategy as the reference (:630-631) — keeps
every scenario in lockstep for batching.

There is no feasibility-failure crash path (the reference prints
infeasibilities and dies, :605-611): the ADMM result is always defined, and
per-scenario residuals are returned so callers can mask diverged scenarios
(SURVEY.md §5 failure-detection upgrade).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cmpc_tpu.config import WalkConfig
from cmpc_tpu.ocp import problem
from cmpc_tpu.ops.admm import ADMMSettings, admm_solve


class SolverState(NamedTuple):
    """Warm-start state carried across control ticks."""

    z: jnp.ndarray   # (n_z,) primal iterate
    y: jnp.ndarray   # (m,) dual iterate


class SolveInfo(NamedTuple):
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    cost: jnp.ndarray
    lyap_violation: jnp.ndarray  # max positive Lyapunov constraint value


def init_solver_state(cfg: WalkConfig, x0=None) -> SolverState:
    z = jnp.zeros(cfg.n_z)
    if x0 is not None:
        X = jnp.tile(x0, (cfg.N + 1, 1))
        z = z.at[: (cfg.N + 1) * 20].set(X.reshape(-1))
    return SolverState(z=z, y=jnp.zeros(problem.num_constraints(cfg)))


def solve_mpc(state: SolverState, params: problem.MPCParams,
              cfg: WalkConfig):
    """One MPC solve: cfg.sqp_iters SQP iterations (python-unrolled),
    each an ADMM QP. Returns (new_state, info)."""
    l_c, u_c = problem.constraint_bounds(cfg)
    l_c, u_c = jnp.asarray(l_c), jnp.asarray(u_c)
    P, q = problem.cost_quadratic(params, cfg)
    settings = ADMMSettings(iters=cfg.admm_iters, rho=cfg.admm_rho,
                            sigma=cfg.admm_sigma, alpha=cfg.admm_alpha)

    z, y = state.z, state.y
    con = lambda zz: problem.constraints(zz, params, cfg)
    r_prim = r_dual = jnp.asarray(0.0)
    for _ in range(cfg.sqp_iters):
        c = con(z)
        J = jax.jacfwd(con)(z)
        b = J @ z - c
        res = admm_solve(P, q, J, l_c + b, u_c + b, z, y, settings)
        z, y = res.x, res.y
        r_prim, r_dual = res.r_prim, res.r_dual

    c_final = con(z)
    n_eq = 20 * (cfg.N + 1)
    lyap = c_final[n_eq:n_eq + cfg.N]
    info = SolveInfo(
        r_prim=r_prim, r_dual=r_dual,
        cost=problem.cost_value(z, params, cfg),
        lyap_violation=jnp.max(jnp.maximum(lyap, 0.0)),
    )
    return SolverState(z=z, y=y), info
