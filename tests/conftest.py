"""Test configuration: force CPU backend with a virtual 8-device mesh.

Sharding tests run against ``--xla_force_host_platform_device_count=8`` so the full
pjit/shard_map path is exercised without TPU hardware. Note: this environment pins
``JAX_PLATFORMS=axon`` (the TPU tunnel plugin) and ignores the env-var override, so
the CPU backend must be selected via ``jax.config.update`` before first use.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# This machine exposes a single CPU core; XLA compiles dominate test time.
# The persistent compilation cache makes re-runs cheap.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

if not os.environ.get("MEDMAMBA_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
