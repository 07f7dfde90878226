"""Worker process for the 2-process jax.distributed (DCN-path) test.

Launched by tests/test_multihost.py as
``python tests/_multihost_worker.py <port> <process_id> <num_processes>``.
Each process owns 2 virtual CPU devices; the global mesh spans all
processes, so `parallel/mesh.sweep`'s psum reductions cross the process
boundary — the CPU stand-in for multi-host DCN collectives
(SURVEY.md §2.5; BASELINE.json scaling row).

Prints one JSON line with the reduced sweep statistics.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 2 * nproc          # global device list

    from cmpc_tpu.config import WalkConfig
    from cmpc_tpu.parallel import mesh as pmesh

    cfg = WalkConfig(sqp_iters=2, admm_iters=5, num_steps=4,
                     ss_duration=7, ds_duration=3)
    n = 2 * len(jax.devices())
    batch = pmesh.make_batch(cfg, n=n, seed=0)      # deterministic: same
    m = pmesh.make_mesh()                           # on every process
    sharded = pmesh.shard_scenarios(batch, m)
    stats = pmesh.sweep(sharded, cfg, T_sim=4, mesh=m)
    print(json.dumps({
        "process": pid,
        "n": float(stats.n),
        "com_rmse_xy": float(stats.com_rmse_xy),
        "max_tilt": float(stats.max_tilt),
        "mean_lyap_violation": float(stats.mean_lyap_violation),
        "mean_r_prim": float(stats.mean_r_prim),
    }), flush=True)


if __name__ == "__main__":
    main()
