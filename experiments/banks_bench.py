"""Persistent-kernel bank-count sweep on the real chip (cover scene).

The single-accumulator flush rewrite frees registers so n_banks can grow;
per-lane workload variance (block-straggler tail) shrinks ~1/sqrt(banks)
while flush RMW costs ~9*banks VMEM ops/iteration.  Find the knee.
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
from simplepathtracer_tpu.render import _persistent_args
from simplepathtracer_tpu.ops.pallas_persistent import render_block_persistent
from simplepathtracer_tpu.scenes import compact_scene

W, H, DEPTH, SPP = 1200, 800, 10, 100


def main():
    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    cam = spt.make_camera(origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20,
                          aperture=0.1, focus_dist=10.0)
    cfg = spt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH)
    tables, sky6, cam19, kd = _persistent_args(scene, cam, cfg, jax.random.PRNGKey(0))
    pixel_ids = jnp.arange(W * H, dtype=jnp.int32)
    paths = W * H * SPP

    for banks in (8, 16, 32):
        f = jax.jit(lambda: render_block_persistent(
            pixel_ids, tables, sky6, cam19, kd, jnp.uint32(0),
            n_samples=SPP, max_depth=DEPTH, width=W, height=H,
            rr_start_depth=0, n_banks=banks,
        ))
        out = f()
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = f()
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        print(f"banks={banks:3d}: {best*1e3:8.1f} ms  {paths/best/1e6:6.1f} Mpaths/s",
              flush=True)
        # Sanity: image statistics stable across bank counts.
        print("   mean radiance", float(jnp.mean(out)), flush=True)


if __name__ == "__main__":
    main()
