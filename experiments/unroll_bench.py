"""Does deeper unrolling (8x, via table padding to a multiple of 8) beat
the round-1 4x?  Hypothesis: the scan is SMEM scalar-load bound (~11
loads/sphere ~ the measured ~15.6 cycles/sphere), so more in-flight
spheres per loop iteration hides latency better."""

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


def pad_tables(tables, multiple=8):
    s = tables[0].shape[0]
    pad = (-s) % multiple
    if pad == 0:
        return tables
    out = []
    for i, t in enumerate(tables):
        if i in (0, 1, 2):       # cx cy cz: far away
            fill = jnp.full((pad,), 3e18, t.dtype)
        elif t.dtype == jnp.int32:
            fill = jnp.zeros((pad,), t.dtype)
        else:                     # radius, r2, attrs: zero (disc < 0 always)
            fill = jnp.zeros((pad,), t.dtype)
        out.append(jnp.concatenate([t, fill]))
    return tuple(out)


def main():
    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    cam = spt.make_camera(origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20,
                          aperture=0.1, focus_dist=10.0)
    cfg = spt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH)
    tables, sky6, cam19, kd = _persistent_args(scene, cam, cfg, jax.random.PRNGKey(0))
    pixel_ids = jnp.arange(W * H, dtype=jnp.int32)
    paths = W * H * SPP
    print("S =", tables[0].shape[0], flush=True)

    for name, tb in (("S=484 (unroll4)", tables), ("S=488 pad (unroll8)", pad_tables(tables))):
        f = jax.jit(lambda tb=tb: render_block_persistent(
            pixel_ids, tb, sky6, cam19, kd, jnp.uint32(0),
            n_samples=SPP, max_depth=DEPTH, width=W, height=H,
            rr_start_depth=0, n_banks=16,
        ))
        out = f()
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            out = f()
            jax.block_until_ready(out)
            best = min(best, time.time() - t0)
        print(f"{name:22s}: {best*1e3:8.1f} ms  {paths/best/1e6:6.1f} Mpaths/s"
              f"  mean {float(jnp.mean(out)):.6f}", flush=True)


if __name__ == "__main__":
    main()
