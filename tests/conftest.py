"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding paths are exercised without contending for the single TPU.

The environment registers the axon TPU plugin in every interpreter via
sitecustomize and forces jax_platforms='axon,cpu' — a plain JAX_PLATFORMS
env var is overridden, so we re-pin the config to cpu here (conftest runs
before any test module imports jax arrays).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import platform  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the closed-loop scans dominate suite time on
# repeat runs; caching compiled programs across test processes cuts that.
# Keyed per machine (r3 advisor: a cache populated on different silicon
# triggers cross-machine AOT warnings and is a numerics wildcard).
_machine = f"{platform.machine()}-{os.cpu_count()}cpu"
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/jax_test_cache-{_machine}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def walk500():
    """One 500-tick nominal walk (long double support + three steps,
    including the first two landings).  Session-scoped: shared by the
    closed-loop behavior tests (test_closed_loop) and the reference-trace
    parity tests (test_parity) — it is the most expensive fixture in the
    suite."""
    from cmpc_tpu.config import WalkConfig, nominal_scenario
    from cmpc_tpu.sim import closed_loop

    cfg = WalkConfig()
    sc = nominal_scenario(cfg, push=(0.0, 0.0, 0.0), push_window=(0, 0))
    _, tr = jax.jit(lambda s: closed_loop.rollout(s, cfg, T_sim=500))(sc)
    return jax.tree.map(np.asarray, tr)
