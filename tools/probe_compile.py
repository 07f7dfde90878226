"""Bisect the round-3 XLA compile blowup (BENCH_r03: 23.5 min compiling the
batched step).  Times trace/lower vs backend-compile separately for each
stage of the condip solve at bench shapes (batch 256), so the blowup can be
attributed to a specific subcomputation.

Usage: python tools/probe_compile.py [stage ...]
  stages: pdip condense hessian linearize rollout solve1 solve6 full
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _t(label, f, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(f).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"{label:12s} lower {t1-t0:7.1f}s  compile {t2-t1:7.1f}s",
          flush=True)
    return compiled


def main():
    from cmpc_tpu.config import WalkConfig, nominal_scenario
    from cmpc_tpu.ocp import assemble, condense, problem
    from cmpc_tpu.ops import sqp
    from cmpc_tpu.ops.pdip import PDIPSettings, pdip_solve
    from cmpc_tpu.plan import com_ref as crm, footsteps, timing as tm
    from cmpc_tpu.models import centroidal as cm

    stages = sys.argv[1:] or ["pdip", "condense", "hessian", "linearize",
                              "solve1", "solve6"]
    cfg = WalkConfig()
    timing = tm.build_timing(cfg)
    sc = nominal_scenario(cfg)
    B = 256

    def make_inputs(s, key):
        plan = footsteps.plan_footsteps(s.vref, cfg, timing, s.foot_y)
        pl, pr = footsteps.contact_pose_refs(plan, timing)
        cref = crm.build_com_ref(plan, cfg, timing, s.foot_y)
        refs = assemble.RefArrays(com=cref, pose_ref_l=pl, pose_ref_r=pr)
        x0 = jnp.zeros(20).at[cm.P_COM].set(
            s.init_com + 0.005 * jax.random.normal(key, (3,)))
        x0 = x0.at[cm.POS_L].set(plan.pos[1]).at[cm.POS_R].set(plan.pos[0])
        params = assemble.gather_params(jnp.asarray(250), x0, refs, timing,
                                        cfg, s.k1, s.k2, s.mpc_mass)
        state = sqp.init_solver_state(cfg, x0, mass=s.mpc_mass)
        return state, params

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    batched = jax.tree.map(lambda x: jnp.stack([x] * B), sc)
    states, params = jax.jit(jax.vmap(make_inputs))(batched, keys)
    jax.block_until_ready(states.z)
    print("inputs ready", flush=True)

    N = cfg.N
    nU = 32 * N
    ns = condense.n_slack(cfg)
    n_eq = 20 * (N + 1)
    w_prox_u = jnp.ones(nU).reshape(N, 32).at[:, 24:].set(1e-3).reshape(-1)

    if "pdip" in stages:
        def one_qp(state, p):
            lam_soft = jnp.clip(state.y[n_eq:n_eq + ns], 0.0, 1e4)
            U = sqp.prep_warmstart(state, p, cfg)
            X = sqp._rollout_X(p.x0, U, p, cfg)
            z = problem.join_z(X, U)
            qp = condense.build(z, p, cfg, cfg.condip_prox, w_prox_u,
                                lam_soft=lam_soft, soft=cfg.condip_soft)
            return qp

        qps = jax.jit(jax.vmap(one_qp))(states, params)
        jax.block_until_ready(qps.H)
        settings = PDIPSettings(iters=cfg.pdip_iters)
        _t("pdip", jax.vmap(lambda q: pdip_solve(q.H, q.g, q.C, q.d,
                                                 settings)), qps)

    if "condense" in stages:
        def cond(state, p):
            lam_soft = jnp.clip(state.y[n_eq:n_eq + ns], 0.0, 1e4)
            U = sqp.prep_warmstart(state, p, cfg)
            X = sqp._rollout_X(p.x0, U, p, cfg)
            z = problem.join_z(X, U)
            return condense.build(z, p, cfg, cfg.condip_prox, w_prox_u,
                                  lam_soft=lam_soft, soft=cfg.condip_soft)
        _t("condense", jax.vmap(cond), states, params)

    if "hessian" in stages:
        def hess(state, p):
            lam_soft = jnp.clip(state.y[n_eq:n_eq + ns], 0.0, 1e4)
            return condense.soft_row_hessian(lam_soft, p, cfg)
        _t("hessian", jax.vmap(hess), states, params)

    if "linearize" in stages:
        def lin(state, p):
            X, U = problem.split_z(state.z, cfg)
            return problem.linearize(state.z, p, cfg)
        _t("linearize", jax.vmap(lin), states, params)

    if "rollout" in stages:
        def roll(state, p):
            U = sqp.prep_warmstart(state, p, cfg)
            return sqp._rollout_X(p.x0, U, p, cfg)
        _t("rollout", jax.vmap(roll), states, params)

    if "solve1" in stages:
        cfg1 = WalkConfig(sqp_iters=1)
        _t("solve1", jax.vmap(lambda s, p: sqp.solve_mpc(s, p, cfg1)),
           states, params)

    if "solve6" in stages:
        _t("solve6", jax.vmap(lambda s, p: sqp.solve_mpc(s, p, cfg)),
           states, params)

    if "full" in stages:
        def step(states, params):
            return jax.vmap(lambda s, p: sqp.solve_mpc(s, p, cfg))(
                states, params)
        _t("full", step, states, params)


if __name__ == "__main__":
    main()
