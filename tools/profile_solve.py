"""Per-component timing of the condip MPC solve on the local accelerator.

Times each stage of ops/sqp._solve_mpc_condip separately at batch B so the
perf work targets the dominant cost.  Sync by scalar fetch (tunneled-TPU
rule, .claude/skills/verify).

Run from /root/repo:  python tools/profile_solve.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))    # compile + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from cmpc_tpu.config import WalkConfig, nominal_scenario
    from cmpc_tpu.ocp import assemble, condense, problem
    from cmpc_tpu.ops import sqp
    from cmpc_tpu.ops.pdip import PDIPSettings, pdip_solve
    from cmpc_tpu.plan import com_ref as crm, footsteps, timing as tm
    from cmpc_tpu.models import centroidal as cm

    cfg = WalkConfig()
    timing = tm.build_timing(cfg)
    sc = nominal_scenario(cfg)

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
    print("device:", jax.devices()[0])

    N = cfg.N
    nU = 32 * N
    w_prox_u = jnp.ones(nU).reshape(N, 32).at[:, 24:].set(1e-3).reshape(-1)
    ns = condense.n_slack(cfg)

    # representative base point: warm-started U + rollout
    @jax.jit
    def prep(states, params):
        def one(s, p):
            U = sqp.prep_warmstart(s, p, cfg)
            X = sqp._rollout_X(p.x0, U, p, cfg)
            return problem.join_z(X, U)
        return jax.vmap(one)(states, params)

    z = prep(states, params)
    lam = jnp.zeros((B, ns))

    @jax.jit
    def f_linearize(z, params):
        return jax.vmap(lambda zz, p: problem.linearize(zz, p, cfg))(
            z, params)

    @jax.jit
    def f_build(z, params, lam):
        return jax.vmap(lambda zz, p, l: condense.build(
            zz, p, cfg, 0.1, w_prox_u, lam_soft=l,
            soft=cfg.condip_soft, structured=True))(z, params, lam)

    @jax.jit
    def f_pdip(qp):
        st = PDIPSettings(iters=cfg.pdip_iters, refine=cfg.pdip_refine)
        return jax.vmap(lambda H, g, C, d, Cb, db: pdip_solve(
            H, g, C, d, st, C_blk=Cb, d_blk=db))(
            qp.H, qp.g, qp.C, qp.d, qp.C_blk, qp.d_blk)

    @jax.jit
    def f_linesearch(z, params, dU):
        def one(zz, p, du):
            X, U = problem.split_z(zz, cfg)
            alphas = (1.0, 0.5, 0.25, 0.1, 0.0)
            U_c = jnp.stack([U + a * du.reshape(cfg.N, 32) for a in alphas])
            X_c = jax.vmap(lambda Uc: sqp._rollout_X(p.x0, Uc, p, cfg))(U_c)
            l_c, u_c = problem.constraint_bounds(cfg)
            n_eq = 20 * (cfg.N + 1)

            def merit(Xc, Uc):
                zc = problem.join_z(Xc, Uc)
                c = problem.constraints(zc, p, cfg)[n_eq:]
                viol = jnp.sum(jnp.maximum(c - jnp.asarray(u_c)[n_eq:], 0.0)
                               + jnp.maximum(jnp.asarray(l_c)[n_eq:] - c,
                                             0.0))
                return problem.cost_value(zc, p, cfg) \
                    + condense.W_ELASTIC * viol
            m = jax.vmap(merit)(X_c, U_c)
            b = jnp.argmin(m)
            return X_c[b], U_c[b]
        return jax.vmap(one)(z, params, dU)

    @jax.jit
    def f_full(states, params):
        return jax.vmap(lambda s, p: sqp.solve_mpc(s, p, cfg))(
            states, params)

    t, (c, J) = timeit(f_linearize, z, params)
    print(f"linearize        : {t:8.2f} ms   J {J.shape}", flush=True)
    t, qp = timeit(f_build, z, params, lam)
    print(f"condense.build   : {t:8.2f} ms   H {qp.H.shape} C {qp.C.shape}",
          flush=True)
    t, res = timeit(f_pdip, qp)
    print(f"pdip ({cfg.pdip_iters} iters) : {t:8.2f} ms", flush=True)
    dU = res.v[:, :nU]
    t, _ = timeit(f_linesearch, z, params, dU)
    print(f"line search (x5) : {t:8.2f} ms", flush=True)
    if "--full" in sys.argv:
        t, _ = timeit(f_full, states, params)
        per = t / 1000.0
        print(f"full solve (x{cfg.sqp_iters})  : {t:8.2f} ms "
              f"-> {B / per:.1f} solves/s", flush=True)


if __name__ == "__main__":
    main()
