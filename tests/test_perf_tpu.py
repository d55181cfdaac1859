"""Performance regression guard (SURVEY.md S4 item 5).

Runs ONLY on real TPU hardware (the CI conftest forces a CPU backend, so
this skips there); execute manually or from a TPU-attached session with:

    JAX_REQUIRE_TPU_PERF=1 python -m pytest tests/test_perf_tpu.py --no-header -q -p no:cacheprovider

Thresholds are deliberately loose (~2x headroom below the measured
~30 Mpaths/s) so they catch real regressions, not machine variance.
"""

import os
import time

import jax
import numpy as np
import pytest

import simplepathtracer_tpu as spt
from simplepathtracer_tpu.render import accumulate, init_state

MIN_PATHS_PER_SEC = 15e6  # measured ~30.8M on v5e; alert below half


@pytest.mark.skipif(
    jax.devices()[0].platform == "cpu" and not os.environ.get("JAX_REQUIRE_TPU_PERF"),
    reason="perf regression thresholds only apply on TPU hardware",
)
def test_cover_scene_throughput_threshold():
    scene = spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512)
    camera = spt.make_camera(
        origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20,
        aperture=0.1, focus_dist=10.0,
    )
    config = spt.RenderConfig(
        width=1200, height=800, spp=32, max_depth=10, spp_chunk=0, use_pallas=True
    )
    key = jax.random.PRNGKey(0)
    state = init_state(config, key)
    state = accumulate(state, scene, camera, config, 32)
    np.asarray(state.accum[:1, :1])  # compile + sync
    t0 = time.time()
    state = accumulate(state, scene, camera, config, 32)
    np.asarray(state.accum[:1, :1])
    pps = config.num_pixels * 32 / (time.time() - t0)
    assert pps > MIN_PATHS_PER_SEC, f"{pps/1e6:.1f} Mpaths/s below threshold"
