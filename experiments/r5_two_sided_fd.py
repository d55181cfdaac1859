"""Round-5 two-sided silhouette gradient validation (CPU, jnp path).

Directional finite differences of the EXPECTED loss vs autodiff of the
stochastic-transparency estimator: with common random numbers, an
eps-parameter shift flips each (ray, bounce) acceptance coin for exactly
the probability mass the silhouette opacity moved, so the FD quotient
converges (in spp) to the true two-sided visibility derivative.  The
round-4 one-sided blend measured AD/FD = 0.49 on geometry leaves
(experiments/r4_fd_validation.py); the detached-ratio REINFORCE estimator
should bring it into [0.9, 1.1].

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/r5_two_sided_fd.py

Scale caveat (late round 5): at this toy size the CENTERS direction's AD
is ~40x smaller than the radii direction's and sits on unowned-edge
noise — it read -0.26 BEFORE the intersection-edge coins and about -0.46
after (not a regression; radii/albedo hold 1.00).  The decisive
geometry-class numbers are the on-chip ones (experiments/
r5_fd_validation.py): 0.92-1.01 across classes with the full estimator,
giant-ground-sphere geometry 0.877 from wrong-signed.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

import simplepathtracer_tpu as spt  # noqa: E402
from simplepathtracer_tpu import inverse  # noqa: E402


def main(spp=512, width=64, height=32, depth=4, softness=0.05, eps=3e-3,
         seed=0):
    scene = spt.three_sphere_scene(hollow_glass=False)
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60)
    cfg = spt.RenderConfig(width=width, height=height, spp=spp,
                           max_depth=depth, silhouette_softness=softness)
    key = jax.random.PRNGKey(seed)
    tkey = jax.random.PRNGKey(seed + 999)

    # Target: hard render of a PERTURBED scene (so silhouettes misalign and
    # geometry gradients are the loss signal).
    prng = np.random.default_rng(11)
    pert = scene.replace(
        centers=scene.centers
        + jnp.asarray(0.05 * prng.standard_normal(scene.centers.shape),
                      jnp.float32),
        radii=scene.radii
        * jnp.asarray(1.0 + 0.06 * prng.standard_normal(scene.radii.shape),
                      jnp.float32),
    )
    target = inverse.render_linear(
        pert, cam, cfg.replace(silhouette_softness=softness), tkey
    )

    params, static_scene = inverse.split_params(scene)

    @jax.jit
    def loss_fn(params):
        return inverse.pixel_loss(params, static_scene, target, cam, cfg, key)

    g = jax.grad(loss_fn)(params)

    rng = np.random.default_rng(3)
    for leaf in ("centers", "radii", "albedo"):
        v = rng.standard_normal(params[leaf].shape)
        v /= np.linalg.norm(v)
        v = jnp.asarray(v, jnp.float32)
        ad = float(jnp.vdot(g[leaf], v))

        def at(t):
            p = dict(params)
            p[leaf] = params[leaf] + t * v
            return float(loss_fn(p))

        fd = (at(eps) - at(-eps)) / (2 * eps)
        print(f"{leaf:8s} AD={ad:+.6e} FD={fd:+.6e} AD/FD={ad / fd:.4f}")


if __name__ == "__main__":
    main()
