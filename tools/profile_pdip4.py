"""A/B variants of the structured pdip on real QP data: block size and
matmul precision.  Reports time for 11-iteration full solves plus the
solution-quality stats of each variant (r_prim/mu percentiles over the
batch) so speed is never read without its accuracy.

Run from /root/repo:  python tools/profile_pdip4.py [B]
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
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
    from cmpc_tpu.ops import batched_chol as bc
    from cmpc_tpu.ops import pdip as pdip_mod
    from cmpc_tpu.plan import com_ref as crm, footsteps, timing as tm

    cfg = WalkConfig()
    timing = tm.build_timing(cfg)
    sc = nominal_scenario(cfg)

    def make_qp(s, key):
        plan = footsteps.plan_footsteps(s.vref, cfg, timing, s.foot_y)
        pl, pr = footsteps.contact_pose_refs(plan, timing)
        cref = crm.build_com_ref(plan, cfg, timing, s.foot_y)
        refs = assemble.RefArrays(com=cref, pose_ref_l=pl, pose_ref_r=pr)
        t = jnp.asarray(250)
        com0 = cref.pos[250] + 0.005 * jax.random.normal(key, (3,))
        x0 = assemble.pack_x0(com0, cref.vel[250], jnp.zeros(3),
                              jnp.zeros(3), pl[250], pr[250], t, plan,
                              refs, timing, cfg)
        p = assemble.gather_params(t, x0, refs, timing, cfg, s.k1, s.k2,
                                   s.mpc_mass)
        st = sqp.init_solver_state(cfg, x0, mass=s.mpc_mass)
        U = sqp.prep_warmstart(st, p, cfg)
        X = sqp._rollout_X(p.x0, U, p, cfg)
        z = problem.join_z(X, U)
        nU = 32 * cfg.N
        w_prox_u = jnp.ones(nU).reshape(cfg.N, 32).at[:, 24:].set(
            1e-3).reshape(-1)
        lam = jnp.zeros(condense.n_slack(cfg))
        return condense.build(z, p, cfg, 0.1, w_prox_u, lam_soft=lam,
                              soft=cfg.condip_soft, structured=True)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    batched = jax.tree.map(lambda x: jnp.stack([x] * B), sc)
    qp = jax.jit(jax.vmap(make_qp))(batched, keys)
    print("device:", jax.devices()[0], " B =", B, flush=True)

    from cmpc_tpu.ops.pdip import PDIPSettings, pdip_solve
    st = PDIPSettings(iters=cfg.pdip_iters, refine=cfg.pdip_refine)

    def run_variant(name, nb, prec):
        # monkeypatch block size and precision for the A/B
        old_mm_bc = bc._mm
        old_mm_pd = pdip_mod._mm
        old_any = bc.spd_inverse_any
        bc._mm = functools.partial(jnp.matmul, precision=prec)
        pdip_mod._mm = functools.partial(jnp.matmul, precision=prec)

        @jax.jit
        def full(qp):
            def one(H, g, C, d, Cb, db):
                return pdip_solve(H, g, C, d, st, C_blk=Cb, d_blk=db)
            return jax.vmap(one)(qp.H, qp.g, qp.C, qp.d, qp.C_blk,
                                 qp.d_blk)

        if nb != 64:
            @jax.custom_batching.custom_vmap
            def inv_nb(M):
                return old_any(M, nb=nb)

            @inv_nb.def_vmap
            def _(axis_size, in_batched, M):
                return old_any(M, nb=nb), True
            old64 = bc.spd_inverse64
            bc.spd_inverse64 = inv_nb
        try:
            t, res = timeit(full, qp)
        finally:
            bc._mm = old_mm_bc
            pdip_mod._mm = old_mm_pd
            if nb != 64:
                bc.spd_inverse64 = old64
        rp = jnp.asarray(res.r_prim)
        mu = jnp.asarray(res.mu)
        print(f"{name:28s}: {t:8.2f} ms   r_prim p50 "
              f"{float(jnp.percentile(rp, 50)):.2e} p95 "
              f"{float(jnp.percentile(rp, 95)):.2e}  mu p50 "
              f"{float(jnp.percentile(mu, 50)):.2e}", flush=True)

    H = jax.lax.Precision.HIGHEST
    HI = jax.lax.Precision.HIGH
    run_variant("nb=64  HIGHEST (base)", 64, H)
    # nb=80 with the fused 2-output tile kernel exceeds the 16M scoped
    # VMEM limit (measured: 21.88M requested) — 64 is the ceiling here
    run_variant("nb=64  HIGH", 64, HI)


if __name__ == "__main__":
    main()
