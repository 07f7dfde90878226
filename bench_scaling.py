"""Scaling harness: sharded-vs-unsharded MPC sweep throughput (VERDICT r2
next-round #7).

Only one physical TPU chip is reachable here, so multi-chip scaling is
measured on the virtual 8-device CPU mesh (the same mechanism the driver's
dryrun uses): the SAME total batch of MPC solves is timed (a) on a 1-device
mesh and (b) shard_map'd across all 8 devices.  On real multi-chip ICI the
per-device work is identical and the only addition is the psum reduction,
so t_sharded/t_unsharded is the framework's sharding overhead; the printed
scaling_eff is that overhead folded into an ideal-speedup estimate.  NOTE:
this host has 2 physical cores — absolute CPU numbers are meaningless, the
RATIO is the measurement.

Prints one JSON line.  Standalone (`python bench_scaling.py`) or imported
by bench.py in a subprocess.
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    from cmpc_tpu.config import WalkConfig
    from cmpc_tpu.parallel import mesh as pmesh

    # small solver config: the measurement is communication overhead, not
    # solve depth.  Sized to finish in tens of seconds on the 2-core CI
    # host (ADVICE r3 #3: the old B=64/T=8 run took >9 min there and was
    # always timed out when bench.py still called it in-path).
    cfg = WalkConfig(sqp_iters=2, pdip_iters=6, num_steps=4,
                     ss_duration=7, ds_duration=3)
    devs = jax.devices()
    n_dev = len(devs)
    B = 2 * n_dev
    batch = pmesh.make_batch(cfg, n=B, seed=0)
    T = 4

    def timed_sweep(mesh, scenarios, reps=2):
        pmesh.sweep(scenarios, cfg, T_sim=T, mesh=mesh)  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            s = pmesh.sweep(scenarios, cfg, T_sim=T, mesh=mesh)
        float(s.com_rmse_xy)   # sync
        return (time.perf_counter() - t0) / reps

    m1 = pmesh.make_mesh(devs[:1])
    t1 = timed_sweep(m1, batch)

    mN = pmesh.make_mesh(devs)
    shard = pmesh.shard_scenarios(batch, mN)
    tN = timed_sweep(mN, shard)

    solves_1 = B * T / t1
    solves_N = B * T / tN
    # On this 2-core host both runs share the same silicon; the sharded run
    # should be >= as fast (same work, split across device threads).  The
    # sharding overhead is what the ratio measures.
    overhead = tN / t1
    print(json.dumps({
        "metric": "sharded_sweep_overhead",
        "value": round(overhead, 4),
        "unit": "t_sharded/t_unsharded (same total work)",
        "extra": {
            "n_devices": n_dev,
            "batch": B, "ticks": T,
            "solves_per_s_1dev": round(solves_1, 1),
            "solves_per_s_mesh": round(solves_N, 1),
            "host_cores": os.cpu_count(),
            "note": "smoke-level overhead bound on a virtual CPU mesh "
                    "(2-core host): the ratio bounds shard_map+psum "
                    "overhead only — it is NOT an ICI/DCN scaling-"
                    "efficiency estimate (ADVICE r3 #3); see "
                    "tests/test_multihost.py for the cross-process DCN "
                    "path",
        },
    }))


if __name__ == "__main__":
    main()
