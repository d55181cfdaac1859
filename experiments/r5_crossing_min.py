"""Minimal crossing-estimator check: ONE half-buried Lambertian sphere on
the ground plane, depth 2, loss = mean linear radiance.  E[L] per pixel is
q * L_sphere + (1-q) * L_plane near the intersection circle, so AD of the
estimator must match CRN FD of its own stochastic forward ~exactly.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/r5_crossing_min.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_platforms", "cpu")

import simplepathtracer_tpu as spt  # noqa: E402
from simplepathtracer_tpu import inverse, scenes  # noqa: E402
from simplepathtracer_tpu.types import Material  # noqa: E402


def main(spp=4096, width=48, height=24, depth=2, softness=0.05, eps=3e-3,
         seed=0):
    sc = scenes._scene_from_lists(
        [[0.0, -0.5, 1.0]], [0.4], [[0.1, 0.2, 0.5]],
        [Material.LAMBERTIAN], [0.0], [1.5],
        scenes.SHIRLEY_SKY_LO, scenes.SHIRLEY_SKY_HI,
    )
    scene = scenes.with_ground_plane(sc)
    cam = spt.make_camera(origin=(0.0, 0.5, -1.2), lookat=(0.0, -0.3, 1.0),
                          vfov_deg=45)
    cfg = spt.RenderConfig(width=width, height=height, spp=spp,
                           max_depth=depth, silhouette_softness=softness)
    key = jax.random.PRNGKey(seed)
    params, static_scene = inverse.split_params(scene)

    @jax.jit
    def loss_fn(params):
        img = inverse.render_linear(
            inverse.merge_params(params, static_scene), cam, cfg, key
        )
        return jnp.mean(img)

    g = jax.grad(loss_fn)(params)

    def probe(leaf, v, label):
        v = jnp.asarray(v, jnp.float32)
        v = v / jnp.sqrt(jnp.vdot(v, v))
        ad = float(jnp.vdot(g[leaf], v))

        def at(t):
            p = dict(params)
            p[leaf] = params[leaf] + t * v
            return float(loss_fn(p))

        lo, hi = at(-eps), at(eps)
        fd = (hi - lo) / (2 * eps)
        print(f"{label:22s} AD={ad:+.6e} FD={fd:+.6e} AD/FD={ad / fd:+.4f}")

    probe("radii", np.array([1.0]), "radius")
    vy = np.zeros((1, 3)); vy[0, 1] = 1.0
    probe("centers", vy, "center +y")
    vo = np.zeros(4 + 3); vo[3] = 1.0
    probe("plane", vo, "plane offset")
    va = np.zeros((1, 3)); va[0, 2] = 1.0
    probe("albedo", va, "albedo b (smooth ref)")


if __name__ == "__main__":
    main()
