"""Round-4 on-chip sweeps behind the sustained-gradient defaults.

Reproduces the measurements recorded in BASELINE.md round 4:

  * bank sweep (grad_regen_banks 8/12/16, unbalanced and balanced):
    unbalanced 24.6 / 25.6 / 24.8 Mpaths/s at the 100-spp sustained + RR
    row -> DEFAULT_BANKS = 12; balanced 26.3 / 26.3 / 26.9 -> the invert
    CLI pins balance + 16 banks.
  * _CHUNK granularity (9/12/15): 24.6 / 24.8 / 24.3 — flat; 9 kept (the
    packing width multiple).
  * balance on/off at default banks: 24.6 -> 26.3 (+7%).

Run on a TPU-attached session:  python experiments/r4_sustained_sweeps.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from simplepathtracer_tpu._cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import simplepathtracer_tpu as spt  # noqa: E402
from simplepathtracer_tpu import inverse  # noqa: E402
from simplepathtracer_tpu.render import (  # noqa: E402
    balanced_pixel_perm,
    grad_safe_config,
)
from simplepathtracer_tpu.scenes import compact_scene  # noqa: E402

SPP = 100


def main():
    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    cam = spt.make_camera(
        origin=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0), vfov_deg=20.0,
        aperture=0.1, focus_dist=10.0,
    )
    cfg = spt.RenderConfig(
        width=1200, height=800, spp=SPP, max_depth=10, spp_chunk=0,
        use_pallas=True,
    )
    key = jax.random.PRNGKey(0)
    params, ss = inverse.split_params(scene)
    target = jnp.zeros((800, 1200, 3), jnp.float32)
    vg = jax.jit(
        jax.value_and_grad(inverse.pixel_loss),
        static_argnames=("config", "leaves"),
    )

    def measure(gcfg, perm, label):
        def go():
            loss, _ = vg(params, ss, target, cam, gcfg, key,
                         leaves=inverse.DIFF_LEAVES, pixel_perm=perm)
            np.asarray(loss)
        t0 = time.time()
        go()
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            go()
            best = min(best, time.time() - t0)
        paths = 1200 * 800 * SPP / 1e6
        print(f"{label}: {best:.3f} s -> {paths / best:.1f} Mpaths/s "
              f"(compile+first {compile_s:.0f} s)")

    for banks in (8, 12, 16):
        gcfg = grad_safe_config(cfg).replace(
            rr_start_depth=2, grad_regen_banks=banks
        )
        measure(gcfg, None, f"unbalanced banks={banks}")
    for banks in (8, 12, 16):
        gcfg = grad_safe_config(cfg).replace(
            rr_start_depth=2, grad_regen_banks=banks
        )
        perm = balanced_pixel_perm(scene, cam, gcfg, key)
        measure(gcfg, perm, f"balanced   banks={banks}")


if __name__ == "__main__":
    main()
