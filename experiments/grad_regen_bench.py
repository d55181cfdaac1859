"""Per-bounce fused vs regeneration fused gradient path, measured on TPU.

    python experiments/grad_regen_bench.py

Prints fwd+bwd Mpaths/s for both implementations at 8 spp/dispatch and the
100-spp remat-chunked sustained rate (VERDICT r3 items 2-3; targets:
>= 15 M at 8 spp, >= 9 M sustained).  Timing discipline per CLAUDE.md:
best of two cache-hit calls, scalar sync.
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
from simplepathtracer_tpu.render import grad_safe_config
from simplepathtracer_tpu.scenes import compact_scene

W, H, DEPTH = 1200, 800, 10


def bench_vg(scene, camera, cfg, key, reps=2):
    params, static_scene = inverse.split_params(scene)
    target = jnp.zeros((H, W, 3), jnp.float32)
    vg = jax.jit(jax.value_and_grad(inverse.pixel_loss), static_argnames=("config",))

    def run():
        loss, _ = vg(params, static_scene, target, camera, cfg, key)
        return float(np.asarray(loss))

    t0 = time.time()
    loss = run()
    compile_s = time.time() - t0
    dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        run()
        dt = min(dt, time.time() - t0)
    return dt, compile_s, loss


def main():
    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    camera = spt.make_camera(origin=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0),
                             vfov_deg=20.0, aperture=0.1, focus_dist=10.0)
    key = jax.random.PRNGKey(0)
    base = spt.RenderConfig(width=W, height=H, spp=8, max_depth=DEPTH,
                            spp_chunk=8, use_pallas=True)
    rows = []
    for name, cfg, spp, reps in (
        ("per-bounce 8spp", grad_safe_config(base).replace(rr_start_depth=0), 8, 2),
        ("regen      8spp", grad_safe_config(base).replace(
            rr_start_depth=0, grad_regen=True), 8, 2),
        ("per-bounce 100spp sustained", grad_safe_config(
            base.replace(spp=100, spp_chunk=0)).replace(rr_start_depth=0), 100, 1),
        ("regen      100spp sustained", grad_safe_config(
            base.replace(spp=100, spp_chunk=0)).replace(
                rr_start_depth=0, grad_regen=True), 100, 1),
    ):
        dt, compile_s, loss = bench_vg(scene, camera, cfg, key, reps)
        pps = W * H * spp / dt
        rows.append((name, dt, pps, compile_s, loss))
        print(f"{name:30s} {dt*1e3:9.1f} ms  {pps/1e6:6.2f} Mpaths/s  "
              f"(compile+first {compile_s:.0f}s, loss {loss:.6f})", flush=True)
    # Loss cross-check: both paths must compute the same loss.
    assert abs(rows[0][4] - rows[1][4]) < 1e-5 * max(1e-9, abs(rows[0][4])), (
        rows[0][4], rows[1][4])


if __name__ == "__main__":
    main()
