"""Test env: force CPU backend with 8 virtual devices BEFORE jax imports.

This is the SURVEY.md S4 "distributed-without-a-cluster" pattern: sharding
tests run on a fake 8-device CPU mesh so multi-chip code paths are exercised
on any machine.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
