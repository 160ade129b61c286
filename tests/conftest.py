"""Test configuration: force CPU backend with 8 virtual devices so
multi-chip sharding paths (shard_map over a Mesh) are exercised without TPU
hardware."""

import os

# The session environment pins JAX_PLATFORMS=axon (the TPU tunnel) and a
# sitecustomize registers the axon backend in every process, overriding the
# env var. Force CPU via jax.config (wins over both) so tests run locally
# with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
