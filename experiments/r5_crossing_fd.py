"""Opaque-opaque INTERSECTION-edge (t-crossing) gradient probe (CPU, jnp).

The round-5 two-sided silhouette estimator handles hit-vs-miss visibility
edges (stochastic transparency over the acceptance coin), but the
documented residual is opaque-opaque intersection edges: a sphere POKING
THROUGH the ground plane.  There both candidates are solid hits (both
opacities saturate at 1) and the discontinuity lives in WHICH hit is
nearer — the plane-vs-sphere winner select ``t_pl < t_sph`` — which no
acceptance smoothing touches.

This probe renders half-buried spheres on the ground plane and compares
directional AD against CRN finite differences of the estimator's own
stochastic forward.  Pre-fix the crossing term is absent, so geometry /
plane-offset AD misses the circle-of-intersection edge mass; a stochastic
WINNER-SELECT coin (sphere wins iff t_s < t_p + logit(u) * sigma_x) with
its probability folded into the detached outcome ratio should bring AD/FD
to ~1.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/r5_crossing_fd.py
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


def poke_scene(metal: bool = False) -> spt.Scene:
    """Ground plane at y=-0.5 with spheres poking through it."""
    centers = [
        [0.0, -0.5, 1.0],    # half-buried: center ON the plane
        [0.9, -0.35, 1.3],   # mostly exposed, bottom buried
        [-0.85, -0.62, 0.9], # mostly buried cap
    ]
    radii = [0.4, 0.3, 0.35]
    albedo = [[0.1, 0.2, 0.5], [0.8, 0.6, 0.2], [0.7, 0.15, 0.15]]
    material = [
        Material.LAMBERTIAN,
        Material.METAL if metal else Material.LAMBERTIAN,
        Material.LAMBERTIAN,
    ]
    fuzz = [0.0, 0.1 if metal else 0.0, 0.0]
    ior = [1.5, 1.5, 1.5]
    sc = scenes._scene_from_lists(
        centers, radii, albedo, material, fuzz, ior,
        scenes.SHIRLEY_SKY_LO, scenes.SHIRLEY_SKY_HI,
    )
    return scenes.with_ground_plane(sc)


def main(spp=1024, width=64, height=32, depth=3, softness=0.05, eps=3e-3,
         seed=0, metal=False):
    scene = poke_scene(metal=metal)
    cam = spt.make_camera(origin=(0.0, 0.5, -1.2), lookat=(0.0, -0.35, 1.0),
                          vfov_deg=55)
    cfg = spt.RenderConfig(width=width, height=height, spp=spp,
                           max_depth=depth, silhouette_softness=softness)
    key = jax.random.PRNGKey(seed)
    tkey = jax.random.PRNGKey(seed + 999)

    prng = np.random.default_rng(11)
    pert = scene.replace(
        centers=scene.centers
        + jnp.asarray(0.04 * prng.standard_normal(scene.centers.shape),
                      jnp.float32),
        radii=scene.radii
        * jnp.asarray(1.0 + 0.05 * prng.standard_normal(scene.radii.shape),
                      jnp.float32),
    )
    target = inverse.render_linear(pert, cam, cfg, tkey)

    params, static_scene = inverse.split_params(scene)

    @jax.jit
    def loss_fn(params):
        return inverse.pixel_loss(params, static_scene, target, cam, cfg, key)

    g = jax.grad(loss_fn)(params)

    def probe(leaf, v, label):
        v = jnp.asarray(v, jnp.float32)
        v = v / jnp.sqrt(jnp.vdot(v, v))
        ad = float(jnp.vdot(g[leaf], v))

        def at(t):
            p = dict(params)
            p[leaf] = params[leaf] + t * v
            return float(loss_fn(p))

        fd = (at(eps) - at(-eps)) / (2 * eps)
        print(f"{label:26s} AD={ad:+.6e} FD={fd:+.6e} AD/FD={ad / fd:+.4f}")

    rng = np.random.default_rng(3)
    for leaf in ("centers", "radii"):
        probe(leaf, rng.standard_normal(params[leaf].shape), leaf + " (random)")
    # Targeted: vertical motion of the half-buried sphere — almost pure
    # intersection-circle edge signal.
    vy = np.zeros(params["centers"].shape); vy[0, 1] = 1.0
    probe("centers", vy, "center0 +y (crossing)")
    vr = np.zeros(params["radii"].shape); vr[0] = 1.0
    probe("radii", vr, "radius0 (crossing)")
    # Plane offset: moving the plane swallows/exposes the caps.
    vo = np.zeros(params["plane"].shape); vo[3] = 1.0
    probe("plane", vo, "plane offset (crossing)")


if __name__ == "__main__":
    import sys
    metal = "--metal" in sys.argv
    main(metal=metal)
