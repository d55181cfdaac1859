"""Warm the persistent XLA/Mosaic compile cache for every program the
driver's bench run needs (VERDICT r3 item 1: never let bench pay a fresh
30-360 s remote compile).  Run from a TPU-attached session after any
kernel-source change:

    python experiments/warm_cache.py [--quick]

Compiles (and runs once, tiny sync) in bench order:
  1. forward accumulate, no RR       4. fwd+bwd 8 spp unchunked (per-bounce)
  2. counts probe (vpu_utilization)  5. fwd+bwd 8 spp unchunked (regen)
  3. forward accumulate, RR          6. fwd+bwd 100 spp remat-chunked
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from simplepathtracer_tpu._cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import inverse
from simplepathtracer_tpu.render import (
    _render_block_pallas, accumulate, grad_safe_config, init_state,
)
from simplepathtracer_tpu.scenes import compact_scene

WIDTH, HEIGHT, DEPTH, BENCH_SPP, GRAD_SPP = 1200, 800, 10, 100, 8


def step(name, fn):
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    print(f"{name:32s} {time.time()-t0:7.1f}s", flush=True)
    return out


def main():
    quick = "--quick" in sys.argv
    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    camera = spt.make_camera(origin=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
                             vfov_deg=20.0, aperture=0.1, focus_dist=10.0)
    config = spt.RenderConfig(width=WIDTH, height=HEIGHT, spp=BENCH_SPP,
                              max_depth=DEPTH, spp_chunk=0, use_pallas=True,
                              balance_probe_spp=2)
    key = jax.random.PRNGKey(0)
    print("device:", jax.devices()[0], flush=True)

    step("fwd accumulate (no RR)", lambda: accumulate(
        init_state(config, key), scene, camera, config, BENCH_SPP).accum[:1, :1])
    pixel_ids = jnp.arange(config.num_pixels, dtype=jnp.int32)
    step("counts probe", lambda: _render_block_pallas(
        scene, camera, config, key, pixel_ids, 0, 2, return_counts=True)[1][:1])
    step("fwd accumulate (RR)", lambda: accumulate(
        init_state(config, key), scene, camera,
        config.replace(rr_start_depth=2), BENCH_SPP).accum[:1, :1])

    params, static_scene = inverse.split_params(scene)
    target = jnp.zeros((HEIGHT, WIDTH, 3), jnp.float32)
    vg = jax.jit(jax.value_and_grad(inverse.pixel_loss), static_argnames=("config",))

    gcfg = grad_safe_config(
        config.replace(spp=GRAD_SPP, spp_chunk=GRAD_SPP)
    ).replace(rr_start_depth=0)
    step("fwd+bwd 8spp (per-bounce)", lambda: vg(
        params, static_scene, target, camera, gcfg, key)[0])
    step("fwd+bwd 8spp (regen)", lambda: vg(
        params, static_scene, target, camera,
        gcfg.replace(grad_regen=True), key)[0])
    if not quick:
        scfg = grad_safe_config(
            config.replace(spp=100, spp_chunk=0)
        ).replace(rr_start_depth=0)
        step("fwd+bwd 100spp sustained", lambda: vg(
            params, static_scene, target, camera, scfg, key)[0])
        step("fwd+bwd 100spp sustained (regen)", lambda: vg(
            params, static_scene, target, camera,
            scfg.replace(grad_regen=True), key)[0])
    print("cache warm.", flush=True)


if __name__ == "__main__":
    main()
