"""Sustained 100-spp gradient throughput through the regen kernels as a
function of spp chunk size (cover scene, 1200x800, depth 10).

Decides the regen-path chunk budget for grad_safe_config: bigger chunks
amortize the ~35 ms/dispatch tunnel cost and the kernel's fixed overhead,
at ~1.05 GB residual HBM per spp (25 fwd planes + 9 bwd ct planes).

Run on the real chip: python experiments/regen_sustained_bench.py [chunks...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import inverse
from simplepathtracer_tpu.render import grad_safe_config
from simplepathtracer_tpu.scenes import compact_scene

SPP = 100

scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
camera = spt.make_camera(origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20,
                         aperture=0.1, focus_dist=10.0)
params, static_scene = inverse.split_params(scene)
key = jax.random.PRNGKey(0)
vg = jax.jit(jax.value_and_grad(inverse.pixel_loss),
             static_argnames=("config",))

chunks = [int(a) for a in sys.argv[1:]] or [4, 5, 10]
for chunk in chunks:
    cfg = grad_safe_config(
        spt.RenderConfig(width=1200, height=800, spp=SPP, max_depth=10,
                         spp_chunk=chunk, use_pallas=True)
    ).replace(rr_start_depth=0, grad_regen=True)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def run():
        loss, _ = vg(params, static_scene, target, camera, cfg, key)
        np.asarray(loss)

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    t0 = time.time()
    run()
    dt = time.time() - t0
    pps = cfg.num_pixels * SPP / dt
    print(f"chunk={chunk}: {dt:.3f}s  {pps/1e6:.2f} Mpaths/s "
          f"(compile+first {compile_s:.1f}s)", flush=True)
