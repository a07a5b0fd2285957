"""Test configuration: force CPU backend with a virtual 8-device mesh.

Sharding tests run against ``--xla_force_host_platform_device_count=8`` so the full
pjit/shard_map path is exercised without TPU hardware. This must happen before the
first ``import jax`` anywhere in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
