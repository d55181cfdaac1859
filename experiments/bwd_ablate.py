"""Ablate the remaining fwd+bwd cost (after the attrs-kernel rewrite).

Variants at 1200x800@1spp depth 10 cover scene:
  full      — current gradient path (attrs kernel + attach + jnp glue)
  fwd_only  — forward alone (no grad)
  no_rng    — bounce_noise replaced by constants (threefry cost)
  no_attach — attach_attr_columns bypassed (bucketing cost; grads to
              geometry only via hit reconstruction... actually zero table
              grads — measures the bucket kernels)
"""

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
    from simplepathtracer_tpu.scenes import compact_scene

    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    cam = spt.make_camera(origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20,
                          aperture=0.1, focus_dist=10.0)
    cfg = spt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH,
                           use_pallas=True)
    gcfg = grad_safe_config(cfg)
    key = jax.random.PRNGKey(1)
    paths = W * H * SPP
    target = jnp.zeros((H, W, 3), jnp.float32)
    params = {k: getattr(scene, k) for k in inverse.DIFF_LEAVES}

    def report(name, dt):
        print(f"{name:24s}: {dt*1e3:8.1f} ms  {paths/dt/1e6:6.2f} Mpaths/s", flush=True)

    fwd = jax.jit(lambda s: render_sample_batch(s, cam, gcfg, key, 0, SPP))
    report("fwd_only", timed(fwd, scene))

    vg = jax.jit(
        lambda p: jax.value_and_grad(inverse.pixel_loss)(
            p, scene, target, cam, gcfg, key, tuple(p)
        )
    )
    report("full fwd+bwd", timed(vg, params))

    # no_rng: stub bounce_noise with a constant (monkeypatch before trace).
    import importlib

    R = importlib.import_module("simplepathtracer_tpu.render")

    orig_noise = R.bounce_noise
    try:
        R.bounce_noise = lambda keys, b: jnp.full(
            (keys.pixel.shape[0], 7), 0.37, jnp.float32
        )
        vg2 = jax.jit(
            lambda p: jax.value_and_grad(inverse.pixel_loss)(
                p, scene, target, cam, gcfg, key, tuple(p)
            )
        )
        report("no_rng fwd+bwd", timed(vg2, params))
    finally:
        R.bounce_noise = orig_noise

    # no_attach: table gradients dropped (bucketing cost isolated).
    from simplepathtracer_tpu.ops import table_gather as TG

    orig_attach = TG.attach_attr_columns
    try:
        TG.attach_attr_columns = (
            lambda interp, table, idx, *cols: tuple(
                jax.lax.stop_gradient(c) for c in cols
            )
        )
        vg3 = jax.jit(
            lambda p: jax.value_and_grad(inverse.pixel_loss)(
                p, scene, target, cam, gcfg, key, tuple(p)
            )
        )
        report("no_attach fwd+bwd", timed(vg3, params))
    finally:
        TG.attach_attr_columns = orig_attach


if __name__ == "__main__":
    main()
