"""Test env: force CPU backend with 8 virtual devices BEFORE any backend init.

This is the SURVEY.md S4 "distributed-without-a-cluster" pattern: sharding
tests run on a fake 8-device CPU mesh so multi-chip code paths are exercised
on any machine.

Note: on the TPU-tunnel image a sitecustomize imports jax at interpreter
startup (before conftest), so setting JAX_PLATFORMS via os.environ here is
too late — jax captured the env at import.  Backends are not *initialized*
until first use though, so updating jax.config still works.
"""

import os

# SPT_TPU_TESTS=1 keeps the real backend so tests/test_tpu_smoke.py (the
# compiled-Mosaic correctness suite) can run against actual hardware.
if not os.environ.get("SPT_TPU_TESTS"):
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Single-process full-suite stability (round-5 VERDICT item 3).

    A full `pytest tests` run in ONE process used to segfault inside
    XLA:CPU's backend_compile_and_load around test ~100 of the suite
    (cumulative compiler/executable state — every shard passes in
    isolation).  Dropping compiled executables and live jaxprs between
    test MODULES keeps the compiler's working set bounded; per-module (not
    per-test) so intra-module jit caching still amortizes tracing.
    """
    yield
    import jax

    jax.clear_caches()
    gc.collect()
