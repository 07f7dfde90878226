"""Large-scale Monte-Carlo robustness sweep on the real chip —
BASELINE.json config-4 class evidence (the reference runs ONE scenario
per process; this runs a randomized batch of full-length walks sharded
over the device mesh and reduces the statistics).

The walk is executed as CHUNKED dispatches (closed_loop.rollout
t0/carry_in): the tunneled-TPU runtime kills the worker on a single
~2,000-iteration scan program (measured: n=8, T=2100 crashes; n=256,
T=100 runs), so each dispatch scans CHUNK ticks and the LoopCarry
(plant + live plan + solver warm start) flows between dispatches,
staying sharded on the mesh throughout.

Writes SWEEP_r05.json.  Run from /root/repo:
    python tools/run_sweep.py [n_scenarios] [T_ticks] [chunk]
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    from cmpc_tpu.config import WalkConfig
    from cmpc_tpu.parallel import mesh as pm
    from cmpc_tpu.plan import timing as tm
    from cmpc_tpu.sim import closed_loop

    cfg = WalkConfig()
    T = int(sys.argv[2]) if len(sys.argv) > 2 else \
        tm.build_timing(cfg).total_ticks
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    axis = "batch"
    m = pm.make_mesh(axis=axis)
    scenarios = pm.shard_scenarios(pm.make_batch(cfg, n, seed=7), m)
    print(f"[sweep] n={n} T={T} chunk={chunk} "
          f"devices={jax.device_count()}", file=sys.stderr, flush=True)

    sh = NamedSharding(m, P(axis))
    carry = jax.jit(
        jax.vmap(lambda s: closed_loop.rollout(s, cfg, T_sim=0)[0]),
        out_shardings=sh)(scenarios)

    @jax.jit
    def chunk_step(scen, carry, t0):
        @partial(jax.shard_map, mesh=m, in_specs=(P(axis), P(axis), P()),
                 out_specs=(P(axis), P(axis)), check_vma=False)
        def run(shard, cshard, t0_):
            def one(s, c):
                carry, tr = closed_loop.rollout(s, cfg, chunk, t0=t0_,
                                                carry_in=c)
                err = jnp.linalg.norm(tr.com_pos[:, :2]
                                      - tr.com_ref[:, :2], axis=-1)
                stats = jnp.stack([jnp.sum(err ** 2), jnp.max(err),
                                   jnp.sum(tr.lyap_violation),
                                   jnp.sum(tr.r_prim)])
                return carry, stats
            return jax.vmap(one)(shard, cshard)
        return run(scen, carry, t0)

    n_chunks = (T + chunk - 1) // chunk
    sum_sq = np.zeros(n)
    max_err = np.zeros(n)
    sum_lyap = np.zeros(n)
    sum_rp = np.zeros(n)
    t0_wall = time.perf_counter()
    for k in range(n_chunks):
        carry, stats = chunk_step(scenarios, carry, jnp.asarray(k * chunk))
        s = np.asarray(stats)                  # (n, 4) — small fetch
        sum_sq += s[:, 0]
        max_err = np.maximum(max_err, s[:, 1])
        sum_lyap += s[:, 2]
        sum_rp += s[:, 3]
        print(f"[sweep] chunk {k + 1}/{n_chunks} done "
              f"({time.perf_counter() - t0_wall:.0f}s)",
              file=sys.stderr, flush=True)
    wall = time.perf_counter() - t0_wall
    ticks = n_chunks * chunk

    payload = {
        "n_scenarios": n,
        "ticks": ticks,
        "solves": n * ticks,
        "wall_s": round(wall, 1),
        "solves_per_s": round(n * ticks / wall, 1),
        "device": str(jax.devices()[0]),
        "chunk": chunk,
        "stats": {
            # survivors' statistics + fall rate: a fallen scenario's
            # post-fall trajectory is unbounded (the per-scenario masked
            # containment keeps it finite but meaningless), so means
            # over the whole batch are dominated by the failures —
            # report the failure RATE and the survivors' tracking
            # quality separately, plus whole-batch percentiles.
            "fall_rate": float(np.mean(max_err > 0.3)),
            "rmse_xy_survivors": float(np.mean(
                np.sqrt(sum_sq / ticks)[max_err <= 0.3])),
            "max_err_survivors": float(max_err[max_err <= 0.3].max()),
            "r_prim_mean_survivors": float(np.mean(
                (sum_rp / ticks)[max_err <= 0.3])),
            "lyap_mean_survivors": float(np.mean(
                (sum_lyap / ticks)[max_err <= 0.3])),
            "err_p50": float(np.percentile(max_err, 50)),
            "err_p95": float(np.percentile(max_err, 95)),
        },
        "note": ("randomized pushes (sigma 10 N), payloads (0-3 kg) and "
                 "gain variations over full-length walks "
                 "(parallel/mesh.make_batch); fall = tracking blowup "
                 "> 0.3 m; wall time includes compile; chunked "
                 "dispatches (see module docstring)"),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SWEEP_r05.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
