"""Round-2 iteration: fwd / fwd+bwd with the fused custom-VJP table gather
(ops/table_gather.py) vs the round-1 numbers (563 ms fwd, 1078 ms fwd+bwd
at 1200x800@1spp depth 10)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from simplepathtracer_tpu._cache import enable_compilation_cache

enable_compilation_cache()

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import inverse
from simplepathtracer_tpu.render import grad_safe_config, render_sample_batch

W, H, DEPTH, SPP = 1200, 800, 10, 1


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best


def main():
    scene = spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512)
    from simplepathtracer_tpu.scenes import compact_scene

    scene = compact_scene(scene)
    cam = spt.make_camera(origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20,
                          aperture=0.1, focus_dist=10.0)
    cfg = spt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH,
                           use_pallas=True)
    gcfg = grad_safe_config(cfg)
    key = jax.random.PRNGKey(1)
    paths = W * H * SPP

    fwd = jax.jit(lambda s: render_sample_batch(s, cam, gcfg, key, 0, SPP))
    dt = timed(fwd, scene)
    print(f"fwd jnp+fused-gather     : {dt*1e3:8.1f} ms  {paths/dt/1e6:6.2f} Mpaths/s", flush=True)

    target = jnp.zeros((H, W, 3), jnp.float32)
    params = {k: getattr(scene, k) for k in inverse.DIFF_LEAVES}
    vg = jax.jit(
        lambda p: jax.value_and_grad(inverse.pixel_loss)(
            p, scene, target, cam, gcfg, key, tuple(p)
        )
    )
    dt = timed(vg, params)
    print(f"fwd+bwd leaves=7         : {dt*1e3:8.1f} ms  {paths/dt/1e6:6.2f} Mpaths/s", flush=True)

    # depth scaling: separates per-bounce cost from fixed (raygen/RNG/accum).
    for depth in (1, 4):
        g1 = grad_safe_config(cfg.replace(max_depth=depth))
        vg1 = jax.jit(
            lambda p: jax.value_and_grad(inverse.pixel_loss)(
                p, scene, target, cam, g1, key, tuple(p)
            )
        )
        dt = timed(vg1, params)
        print(f"fwd+bwd depth={depth}          : {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
