"""A/B the streamed-idx gradient scheme against chunked remat on the chip.

Reproduces the round-3 sustained-throughput result (BASELINE.md):
    chunked remat  (grad_regen_stream=False): 7057 ms  13.6 Mpaths/s
    streamed idx   (grad_regen_stream=True):  4731 ms  20.3 Mpaths/s
    loss delta: 0.0 (bit-identical — phase A runs the same forward kernel)
Decomposition (separate run): phase A idx-only forward 2784 ms
(34.5 Mpaths/s, +1 residual plane over the pure persistent forward's
33.5), phase B scan-free re-forward + backward + bucket ~1950 ms.
Chunk sweep: 4 / 5 / 8 -> 19.9 / 20.2 / 20.3 Mpaths/s (fixed costs are
small once the scans are gone); chunk 10 is a genuine HBM OOM
(25 fwd + 9 ct planes ~12.5 GB + 3.6 GB idx planes > 15.75 GB).

Usage (real chip): python experiments/grad_stream_bench.py [spp]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import inverse
from simplepathtracer_tpu._cache import enable_compilation_cache
from simplepathtracer_tpu.render import grad_safe_config
from simplepathtracer_tpu.scenes import compact_scene


def main(spp=100):
    enable_compilation_cache()
    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    camera = spt.make_camera(
        origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20,
        aperture=0.1, focus_dist=10.0,
    )
    key = jax.random.PRNGKey(0)
    target = jnp.zeros((800, 1200, 3), jnp.float32)
    params, static_scene = inverse.split_params(scene)
    vg = jax.jit(jax.value_and_grad(inverse.pixel_loss), static_argnames=("config",))

    def bench(stream, label):
        gcfg = grad_safe_config(
            spt.RenderConfig(width=1200, height=800, spp=spp, max_depth=10,
                             spp_chunk=0, use_pallas=True)
        ).replace(rr_start_depth=0, grad_regen=True, grad_regen_stream=stream)
        args = (params, static_scene, target, camera, gcfg, key)
        loss, _ = vg(*args)
        np.asarray(loss)
        dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            loss, _ = vg(*args)
            np.asarray(loss)
            dt = min(dt, time.time() - t0)
        print(f"{label}: {dt * 1e3:.0f} ms  "
              f"{1200 * 800 * spp / dt / 1e6:.1f} Mpaths/s  chunk "
              f"{gcfg.spp_chunk}  loss {float(loss):.6f}", flush=True)
        return float(loss)

    l_remat = bench(False, "chunked remat ")
    l_stream = bench(True, "streamed idx  ")
    print("loss delta:", abs(l_remat - l_stream), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
