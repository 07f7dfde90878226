"""Record the production closed-loop walk's per-tick measured states
(the x0 each MPC solve ran from) plus the solver's residuals into
assets/walk_x0.npz — the bench's input corpus.

bench.py replays solves from these states verbatim (same warm-start
chain the deployed controller rides), so the timed/gated solves are
statistically identical to production ones instead of synthetic
near-reference clones (measured: synthetic tick-250 states solved to
r_prim p50 2.8e-3 while the real loop's mid-single-support solves sit
at ~1.2e-1 — the synthetic bench graded an easier problem).

Run from /root/repo (CPU, ~3 min):  python tools/record_walk_states.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np       # noqa: E402

T_REC = 800   # initial double support + 7 full steps (several landings)


def main():
    from cmpc_tpu.config import WalkConfig, nominal_scenario
    from cmpc_tpu.sim import closed_loop

    cfg = WalkConfig()
    sc = nominal_scenario(cfg)
    _, tr = jax.jit(lambda s: closed_loop.rollout(s, cfg,
                                                  T_sim=T_REC))(sc)
    x0 = np.asarray(tr.x0)
    r_prim = np.asarray(tr.r_prim)
    lyap = np.asarray(tr.lyap_violation)
    com, ref = np.asarray(tr.com_pos), np.asarray(tr.com_ref)
    err = np.abs(com[:, :2] - ref[:, :2]).max()
    assert err < 0.05, f"walk unhealthy (err {err:.3f}) — not recording"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "walk_x0.npz")
    np.savez_compressed(
        out, x0=x0.astype(np.float32), r_prim=r_prim.astype(np.float32),
        lyap=lyap.astype(np.float32),
        meta=np.array([cfg.sqp_iters, cfg.pdip_iters, T_REC],
                      dtype=np.int32))
    print(f"recorded {T_REC} ticks -> {out}; walk err {err:.4f}, "
          f"r_prim p50 {np.percentile(r_prim, 50):.2e} "
          f"p95 {np.percentile(r_prim, 95):.2e}")


if __name__ == "__main__":
    main()
