"""Benchmark: batched centroidal MPC solves/s on the local accelerator.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 1250.0}

vs_baseline is the fraction of this chip's share of the north-star target
(BASELINE.json: >= 10,000 batched solves/s on one v5e *host* = 8 chips =>
1,250 solves/s/chip).  The reference performs ~1 IPOPT solve / 10 ms tick
on CPU (~100 solves/s, single scenario).
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from cmpc_tpu.config import WalkConfig, nominal_scenario
    from cmpc_tpu.ocp import assemble, problem
    from cmpc_tpu.ops import sqp
    from cmpc_tpu.plan import com_ref as crm, footsteps, timing as tm
    from cmpc_tpu.models import centroidal as cm

    cfg = WalkConfig(sqp_iters=2, admm_iters=15)
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
    states, params = jax.jit(jax.vmap(make_inputs))(batched, keys)

    @jax.jit
    def step(states, params):
        new_states, infos = jax.vmap(
            lambda s, p: sqp.solve_mpc(s, p, cfg))(states, params)
        return new_states, infos

    # warmup / compile.  NOTE: on the tunneled TPU backend
    # jax.block_until_ready returns before remote completion — the only
    # reliable sync is a (tiny) device->host fetch, so all timing below
    # syncs by fetching a reduced scalar.
    out_states, infos = step(states, params)
    _ = float(jnp.sum(out_states.z))

    reps = 10
    t0 = time.perf_counter()
    s = out_states
    for _ in range(reps):
        s, infos = step(s, params)
    _ = float(jnp.sum(s.z))   # 4-byte fetch forces completion
    dt = time.perf_counter() - t0

    solves_per_s = B * reps / dt
    # p50-ish single-batch latency
    lat_ms = dt / reps * 1e3

    print(json.dumps({
        "metric": "mpc_solves_per_s",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 1250.0, 3),
        "extra": {
            "batch": B,
            "batch_latency_ms": round(lat_ms, 2),
            "device": str(jax.devices()[0]),
            "mean_r_prim": float(jnp.mean(infos.r_prim)),
        },
    }))


if __name__ == "__main__":
    main()
