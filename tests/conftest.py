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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
