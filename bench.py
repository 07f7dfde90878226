"""Benchmark: batched centroidal MPC solves/s on the local accelerator.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 1250.0}

vs_baseline is the fraction of this chip's share of the north-star target
(BASELINE.json: >= 10,000 batched solves/s on one v5e *host* = 8 chips =>
1,250 solves/s/chip).  The reference performs ~1 IPOPT solve / 10 ms tick
on CPU (~100 solves/s, single scenario).

Accuracy gate (VERDICT round-1 #3): a solves/s number is only reported as
`value` if the batch's mean primal residual passes R_PRIM_GATE; otherwise
value is 0.0 and the raw throughput is kept in extra.ungated — a fast
wrong answer is not a perf number.

Honesty (VERDICT round-2 weak #2): every timed reputation solves the SAME
fresh (cold-warm-started) problem — inputs are NOT carried between reps,
so the gated residual is that of a fresh solve, not a 10x-re-converged
one.  The gate residuals come from the very solves being timed.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

R_PRIM_GATE = 1e-2      # mean max-violation across the batch must beat this
LYAP_GATE = 1e-2        # mean Lyapunov-row violation cap


def _sync_scalar(x):
    """Device->host fetch of a reduced scalar.  On the tunneled TPU backend
    jax.block_until_ready returns before remote completion — a tiny fetch
    is the only reliable sync."""
    return float(jnp.sum(x))


def _progress(msg):
    """Stage markers on stderr (stdout carries only the JSON line)."""
    print(f"[bench] {time.strftime('%H:%M:%S')} {msg}",
          file=sys.stderr, flush=True)


def main():
    from cmpc_tpu.config import WalkConfig, nominal_scenario
    from cmpc_tpu.ocp import assemble
    from cmpc_tpu.ops import sqp
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

    B = 256
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    batched = jax.tree.map(lambda x: jnp.stack([x] * B), sc)
    _progress("building inputs")
    states, params = jax.jit(jax.vmap(make_inputs))(batched, keys)
    _progress("inputs ready")

    @jax.jit
    def step(states, params):
        new_states, infos = jax.vmap(
            lambda s, p: sqp.solve_mpc(s, p, cfg))(states, params)
        return new_states, infos

    # warmup / compile
    _progress("compiling batched step")
    out_states, infos = step(states, params)
    _sync_scalar(out_states.z)
    _progress("compiled; timing reps")

    # fresh solves: identical inputs every rep — the residuals gated on
    # below are produced by solves statistically identical to the timed
    # ones (re-solving from an ever-warmer state overstated accuracy and
    # understates per-solve work, VERDICT r2 weak #2)
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        s, infos = step(states, params)
    _sync_scalar(s.z)
    dt = time.perf_counter() - t0

    solves_per_s = B * reps / dt
    lat_ms = dt / reps * 1e3
    _progress(f"batched reps done ({solves_per_s:.1f}/s); single-solve p50")

    mean_r_prim = float(jnp.mean(infos.r_prim))
    mean_lyap = float(jnp.mean(infos.lyap_violation))
    gated = mean_r_prim < R_PRIM_GATE and mean_lyap < LYAP_GATE

    # ---- single-scenario p50 latency vs the 10 ms real-time budget
    # (BASELINE.md real-time row)
    s1 = jax.tree.map(lambda x: x[:1], states)
    p1 = jax.tree.map(lambda x: x[:1], params)
    o1, _ = step(s1, p1)
    _sync_scalar(o1.z)
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        o1, _ = step(s1, p1)
        _sync_scalar(o1.z)
        lats.append(time.perf_counter() - t0)
    lats.sort()
    p50_single_ms = lats[len(lats) // 2] * 1e3
    _progress("scaling subprocess")

    # ---- sharded-vs-unsharded scaling proxy (virtual CPU mesh, see
    # bench_scaling.py).  Subprocess so the CPU mesh cannot disturb the
    # TPU numbers; skipped on any failure/timeout.
    scaling = None
    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_scaling.py")],
            capture_output=True, text=True, timeout=420)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                scaling = json.loads(line)["extra"]
                break
    except Exception:
        pass

    print(json.dumps({
        "metric": "mpc_solves_per_s",
        "value": round(solves_per_s, 1) if gated else 0.0,
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1250.0, 3) if gated else 0.0,
        "extra": {
            "batch": B,
            "batch_latency_ms": round(lat_ms, 2),
            "device": str(jax.devices()[0]),
            "mean_r_prim": mean_r_prim,
            "mean_lyap_violation": mean_lyap,
            "accuracy_gate": {"r_prim": R_PRIM_GATE, "lyap": LYAP_GATE,
                              "passed": bool(gated)},
            "ungated_solves_per_s": round(solves_per_s, 1),
            "p50_single_solve_ms": round(p50_single_ms, 3),
            "solver": cfg.mpc_solver,
            "scaling": scaling,
        },
    }))


if __name__ == "__main__":
    main()
