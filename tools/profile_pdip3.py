"""Incremental-body timing of the STRUCTURED pdip iteration on real QP
data at batch level: scans of 11 iterations of progressively larger
bodies; the marginal cost of each piece is the difference between
adjacent rows.  Batch-level ops mirror what vmap(pdip_solve) lowers to
(including the custom_vmap'd blocked inverse with its Pallas tile factor).

Run from /root/repo:  python tools/profile_pdip3.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
ITERS = 11


def timeit(fn, *args, reps=5):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from cmpc_tpu.config import WalkConfig, nominal_scenario
    from cmpc_tpu.ocp import assemble, condense, problem
    from cmpc_tpu.ops import sqp
    from cmpc_tpu.ops import batched_chol as bc
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
    print("device:", jax.devices()[0], " B =", B, " iters =", ITERS,
          flush=True)
    n = qp.H.shape[-1]
    Nb, rb, cb = qp.C_blk.shape[-3:]
    m_d = qp.C.shape[-2]
    m = m_d + Nb * rb
    bcols = (32 * np.arange(Nb))[:, None] + np.arange(cb)[None]
    CT = jnp.swapaxes(qp.C, -1, -2)

    def mk_M(H, C, C_blk, w, lam):
        dscale = jnp.clip(lam / w, 1e-12, 1e6)
        dd, db = dscale[:, :m_d], dscale[:, m_d:].reshape(B, Nb, rb)
        M = H + _mm(CT * dd[:, None, :], C) \
            + 1e-7 * jnp.eye(n, dtype=H.dtype)
        Bq = jnp.einsum("bnrc,bnr,bnrd->bncd", C_blk, db, C_blk,
                        precision=jax.lax.Precision.HIGHEST)
        return M.at[:, bcols[:, :, None], bcols[:, None, :]].add(Bq)

    def Cmv(C, C_blk, x):
        vb = x[:, :32 * Nb].reshape(B, Nb, 32)[:, :, :cb]
        bv = jnp.einsum("bnrc,bnc->bnr", C_blk, vb, precision="highest")
        return jnp.concatenate(
            [jnp.einsum("bmn,bn->bm", C, x, precision="highest"),
             bv.reshape(B, -1)], axis=1)

    def CTmv(C, C_blk, wv):
        wd, wb = wv[:, :m_d], wv[:, m_d:].reshape(B, Nb, rb)
        blk = jnp.einsum("bnrc,bnr->bnc", C_blk, wb, precision="highest")
        pad = jnp.zeros((B, Nb, 32 - cb), wv.dtype)
        return jnp.einsum("bmn,bm->bn", C, wd, precision="highest") \
            + jnp.pad(jnp.concatenate([blk, pad], axis=2).reshape(B, -1),
                      ((0, 0), (0, n - 32 * Nb)))

    def scan11(body_one):
        def prog(H, g, C, d, C_blk, d_blk):
            dall = jnp.concatenate([d, d_blk.reshape(B, -1)], axis=1)
            v = jnp.zeros_like(g)
            w = jnp.maximum(dall, 1.0)
            lam = jnp.ones((B, m), H.dtype)

            def body(carry, _):
                v, w, lam = carry
                out = body_one(H, g, C, d, dall, C_blk, d_blk, v, w, lam)
                v2 = v + 1e-6 * out[0].reshape(B, -1)[:, :n]
                return (v2, w * 1.000001, lam * 0.999999), None

            (v, w, lam), _ = jax.lax.scan(body, (v, w, lam), None,
                                          length=ITERS)
            return v

        return jax.jit(prog)

    def s_ctdc(H, g, C, d, dall, C_blk, d_blk, v, w, lam):
        return (mk_M(H, C, C_blk, w, lam)[:, :, 0],)

    def s_chol(H, g, C, d, dall, C_blk, d_blk, v, w, lam):
        M = mk_M(H, C, C_blk, w, lam)
        L, Dinv = bc.blocked_cholesky(M, 64)
        return (L[:, :, 0] + Dinv[:, 0, 0, 0][:, None],)

    def s_inv(H, g, C, d, dall, C_blk, d_blk, v, w, lam):
        M = mk_M(H, C, C_blk, w, lam)
        L, Dinv = bc.blocked_cholesky(M, 64)
        Linv = bc.tri_inv_blocksub(L, Dinv)
        Minv = _mm(jnp.swapaxes(Linv, -1, -2), Linv)
        return (Minv[:, :, 0],)

    def s_newton(H, g, C, d, dall, C_blk, d_blk, v, w, lam):
        M = mk_M(H, C, C_blk, w, lam)
        L, Dinv = bc.blocked_cholesky(M, 64)
        Linv = bc.tri_inv_blocksub(L, Dinv)
        Minv = _mm(jnp.swapaxes(Linv, -1, -2), Linv)
        r_d = jnp.einsum("bij,bj->bi", H, v, precision="highest") + g \
            + CTmv(C, C_blk, lam)
        r_p = Cmv(C, C_blk, v) + w - dall
        out = 0.0
        for scale in (1.0, 0.5):
            r_c = w * lam * scale
            rhs = -r_d + CTmv(C, C_blk, (r_c - lam * r_p) / w)
            dv = jnp.einsum("bij,bj->bi", Minv, rhs, precision="highest")
            dv = dv + jnp.einsum(
                "bij,bj->bi", Minv,
                rhs - jnp.einsum("bij,bj->bi", M, dv, precision="highest"),
                precision="highest")
            dw = -r_p - Cmv(C, C_blk, dv)
            dlam = (-r_c - lam * dw) / w
            out = out + dv + dlam[:, :n] + dw[:, :n]
        return (out,)

    rows = [("ctdc+scatter", s_ctdc), ("+blocked_chol", s_chol),
            ("+tri_inv+Minv", s_inv), ("+2x newton apps", s_newton)]
    prev = 0.0
    for name, f in rows:
        t = timeit(scan11(f), qp.H, qp.g, qp.C, qp.d, qp.C_blk, qp.d_blk)
        print(f"{name:18s}: {t:8.2f} ms   (marginal {t - prev:+7.2f})",
              flush=True)
        prev = t

    from cmpc_tpu.ops.pdip import PDIPSettings, pdip_solve
    st = PDIPSettings(iters=ITERS, refine=cfg.pdip_refine)

    @jax.jit
    def full(qp):
        return jax.vmap(lambda H, g, C, d, Cb, db: pdip_solve(
            H, g, C, d, st, C_blk=Cb, d_blk=db).v)(
            qp.H, qp.g, qp.C, qp.d, qp.C_blk, qp.d_blk)

    t = timeit(full, qp)
    print(f"{'full pdip_solve':18s}: {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
