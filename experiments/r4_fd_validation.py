"""Round-4 on-chip directional finite-difference validation of the
soft + plane + RR + streamed gradient path (compiled Mosaic).

Methodology (the round-3 notes call directional FD "the decisive check"):
one random direction v over a leaf subset, compare <grad, v> against the
central difference of the jitted loss at several eps.  Measured
(256x128@64spp, depth 6, softness 0.05, rr 2, ground plane):

  * smooth leaves (albedo, sky, plane offset+albedo), with the DETACHED
    plane-normal entries zeroed from v: rel err 1.6 / 1.6 / 1.1 % at
    eps 3e-2 / 1e-2 / 3e-3 — the AD is exact on everything it claims.
    (Leaving the normal entries in v reads ~9%: FD sees d/d(normal),
    AD detaches it by design.)
  * geometry (centers, radii): AD/FD = 0.49 — the measured confirmation
    that the one-sided soft blend captures the HIT side of visibility
    edges, a same-sign half-magnitude estimator (BASELINE.md round 4).

Run on a TPU-attached session: python experiments/r4_fd_validation.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from simplepathtracer_tpu._cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import simplepathtracer_tpu as spt  # noqa: E402
from simplepathtracer_tpu import inverse  # noqa: E402
from simplepathtracer_tpu.scenes import with_ground_plane  # noqa: E402


def main():
    scene = with_ground_plane(spt.three_sphere_scene(hollow_glass=False))
    scene = scene.replace(plane=jnp.asarray(scene.plane).at[3].set(0.6))
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60)
    cfg = spt.RenderConfig(
        width=256, height=128, spp=64, max_depth=6,
        use_pallas_grad=True, grad_regen=True,
        silhouette_softness=0.05, rr_start_depth=2,
    )
    key = jax.random.PRNGKey(11)
    target = jnp.full((128, 256, 3), 0.3, jnp.float32)
    params, ss = inverse.split_params(scene)
    loss_fn = jax.jit(inverse.pixel_loss, static_argnames=("config",))
    vg = jax.jit(
        jax.value_and_grad(inverse.pixel_loss), static_argnames=("config",)
    )
    _, g = vg(params, ss, target, cam, cfg, key)

    def check(leafset, scale, drop_normal):
        dk = jax.random.PRNGKey(42)
        v = {
            k: (jax.random.normal(jax.random.fold_in(dk, i), params[k].shape)
                * scale if k in leafset else jnp.zeros_like(params[k]))
            for i, k in enumerate(sorted(params))
        }
        if drop_normal and "plane" in v:
            v["plane"] = v["plane"].at[:3].set(0.0)
        gv = sum(float(jnp.vdot(g[k], v[k])) for k in g)
        for eps in (3e-2, 1e-2, 3e-3):
            pp = jax.tree.map(lambda p, d: p + eps * d, params, v)
            pm = jax.tree.map(lambda p, d: p - eps * d, params, v)
            fd = (
                float(loss_fn(pp, ss, target, cam, cfg, key))
                - float(loss_fn(pm, ss, target, cam, cfg, key))
            ) / (2 * eps)
            print(
                f"{sorted(leafset)} eps {eps:.0e}: AD {gv:.6g} FD {fd:.6g} "
                f"ratio {gv / fd:.3f}"
            )

    check({"albedo", "sky_lo", "sky_hi", "plane"}, 0.3, drop_normal=True)
    check({"centers", "radii"}, 0.1, drop_normal=False)


if __name__ == "__main__":
    main()
