"""Scenario-parallel execution over device meshes.

The reference is strictly single-process/single-thread (SURVEY.md §2.5); all
parallelism here is new capability.  Scenarios shard over a 1-D "batch" mesh
axis: `shard_map` runs the vmapped closed loop per shard, and summary
statistics reduce over ICI with `jax.lax` collectives — the TPU-native
replacement for a distributed communication backend.

Multi-host: call `jax.distributed.initialize()` before `make_mesh()` and the
same code spans hosts (DCN) transparently via the global device list.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmpc_tpu.config import Scenario, WalkConfig
from cmpc_tpu.sim import closed_loop


def make_mesh(devices=None, axis: str = "batch") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


class SweepStats(NamedTuple):
    """Collective summary over a scenario sweep (psum-reduced over ICI)."""

    n: jnp.ndarray                 # scenario count
    com_rmse_xy: jnp.ndarray       # mean RMSE of CoM xy tracking
    max_tilt: jnp.ndarray          # max |com_xy - ref_xy| over the sweep
    fall_rate: jnp.ndarray         # fraction with tracking blowup (> 0.3 m)
    mean_lyap_violation: jnp.ndarray
    mean_r_prim: jnp.ndarray


def _summarize(tr: closed_loop.Trace):
    err = jnp.linalg.norm(tr.com_pos[:, :2] - tr.com_ref[:, :2], axis=-1)
    rmse = jnp.sqrt(jnp.mean(err ** 2))
    return rmse, jnp.max(err), (jnp.max(err) > 0.3).astype(jnp.float32), \
        jnp.mean(tr.lyap_violation), jnp.mean(tr.r_prim)


def sweep(scenarios: Scenario, cfg: WalkConfig, T_sim: int,
          mesh: Mesh | None = None, axis: str = "batch") -> SweepStats:
    """Run a batched scenario sweep sharded over the mesh; returns
    psum-reduced statistics.  `scenarios` leaves must have a leading batch
    axis divisible by the mesh size."""
    mesh = mesh or make_mesh(axis=axis)

    # check_vma=False: the solver's Pallas tile kernel (ops/batched_chol)
    # declares its out_shape without a vma annotation, which the vma
    # checker rejects inside shard_map on TPU; the sweep body is
    # embarrassingly parallel (per-scenario closed loops + explicit
    # psum reductions), so the check adds no safety here.  The dryrun
    # equivalence surface (__graft_entry__.dryrun_multichip) keeps
    # check_vma on for the CPU-mesh path where the Pallas kernel does
    # not dispatch.
    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(),
             check_vma=False)
    def run(shard: Scenario) -> SweepStats:
        _, tr = jax.vmap(lambda s: closed_loop.rollout(s, cfg, T_sim))(shard)
        rmse, maxe, fell, lyap, rprim = jax.vmap(_summarize)(tr)
        n_local = jnp.asarray(rmse.shape[0], jnp.float32)
        n = jax.lax.psum(n_local, axis)
        return SweepStats(
            n=n,
            com_rmse_xy=jax.lax.psum(jnp.sum(rmse), axis) / n,
            max_tilt=jax.lax.pmax(jnp.max(maxe), axis),
            fall_rate=jax.lax.psum(jnp.sum(fell), axis) / n,
            mean_lyap_violation=jax.lax.psum(jnp.sum(lyap), axis) / n,
            mean_r_prim=jax.lax.psum(jnp.sum(rprim), axis) / n,
        )

    return jax.jit(run)(scenarios)


class PerScenarioStats(NamedTuple):
    """Un-reduced per-scenario summary (leading axis = scenario)."""

    rmse: jnp.ndarray       # (B,) CoM xy tracking RMSE
    max_err: jnp.ndarray    # (B,) max CoM xy tracking error
    lyap: jnp.ndarray       # (B,) mean Lyapunov violation
    r_prim: jnp.ndarray     # (B,) mean primal residual


def sweep_per_scenario(scenarios: Scenario, cfg: WalkConfig, T_sim: int,
                       mesh: Mesh | None = None,
                       axis: str = "batch") -> PerScenarioStats:
    """Like :func:`sweep` but returns the per-scenario statistics without
    any collective reduction (out_specs keeps them sharded over the mesh).
    This is the multi-chip equivalence surface: per-scenario outputs can be
    compared shard-for-shard against a single-device run of the same shard
    width, isolating the sharding machinery from XLA's batch-width-
    dependent fusion (VERDICT r3 next #2)."""
    mesh = mesh or make_mesh(axis=axis)

    @partial(jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    def run(shard: Scenario) -> PerScenarioStats:
        _, tr = jax.vmap(lambda s: closed_loop.rollout(s, cfg, T_sim))(shard)
        rmse, maxe, _, lyap, rprim = jax.vmap(_summarize)(tr)
        return PerScenarioStats(rmse=rmse, max_err=maxe, lyap=lyap,
                                r_prim=rprim)

    return jax.jit(run)(scenarios)


def shard_scenarios(scenarios: Scenario, mesh: Mesh,
                    axis: str = "batch") -> Scenario:
    """Place a batched Scenario with its leading axis sharded on the mesh.

    Works in both single-process (device_put across local devices) and
    multi-process/multi-host mode (every process holds the full batch —
    scenario generation is deterministic — and contributes the shards its
    addressable devices own via make_array_from_callback; the global
    array then spans hosts over DCN)."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_callback(
                jnp.shape(x), sharding,
                lambda idx, _x=x: np.asarray(_x)[idx]),
            scenarios)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), scenarios)


def make_batch(cfg: WalkConfig, n: int, seed: int = 0,
               push_scale: float = 10.0,
               payload_max: float = 3.0) -> Scenario:
    """A randomized robustness batch: lateral/sagittal pushes, payload
    masses, gain variations — the Monte-Carlo envelope of the reference's
    two hand-built scenarios (BASELINE.json configs 3-5)."""
    from cmpc_tpu.config import nominal_scenario
    rng = np.random.default_rng(seed)
    base = nominal_scenario(cfg)

    def tile(x):
        return jnp.broadcast_to(jnp.asarray(x), (n,) + jnp.shape(jnp.asarray(x)))

    push = rng.normal(size=(n, 3)) * np.array([push_scale, push_scale, 0.0])
    start = rng.integers(300, 1200, size=n)
    dur = rng.integers(50, 150, size=n)
    payload = rng.uniform(0.0, payload_max, size=n)
    onset = rng.integers(0, 800, size=n)
    k1 = np.where(payload > 1.0, 7.0, 4.0)
    k2 = np.where(payload > 1.0, 1.0, 0.1)
    # gait-geometry sweep (BASELINE.json config 4): step length via
    # velocity-command scaling, lateral offset around the reference 0.1 m
    vel_scale = rng.uniform(0.7, 1.2, size=(n, 1, 1))
    step_y = rng.uniform(0.085, 0.115, size=n)
    return Scenario(
        k1=jnp.asarray(k1, jnp.float32),
        k2=jnp.asarray(k2, jnp.float32),
        mpc_mass=tile(base.mpc_mass),
        plant_mass=tile(base.plant_mass),
        push_force=jnp.asarray(push, jnp.float32),
        push_torque=jnp.zeros((n, 3), jnp.float32),
        push_start=jnp.asarray(start),
        push_end=jnp.asarray(start + dur),
        vref=jnp.asarray(np.asarray(base.vref) * vel_scale, jnp.float32),
        init_com=tile(base.init_com),
        init_vel=tile(base.init_vel),
        foot_y=tile(base.foot_y),
        payload_mass=jnp.asarray(payload, jnp.float32),
        payload_onset=jnp.asarray(onset),
        payload_impact_vel=jnp.full((n,), float(np.sqrt(2 * 9.81 * 0.1)),
                                    jnp.float32),
        step_y_offset=jnp.asarray(step_y, jnp.float32),
    )
