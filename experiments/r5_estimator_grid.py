"""Round-5 estimator grid: AD/FD per scene class x leaf class, jnp path.

Statistically solid version of the ad-hoc probes: averages AD and FD over
several keys (common random numbers per key), reports means +- sem, for
scene variants that isolate the estimator's discontinuity classes:

  * lambert   — trio + ground plane, all Lambertian (pure silhouettes)
  * metal     — trio with the metal sphere back
  * glass     — trio with the dielectric back (Schlick coin + TIR)
  * giant     — lambert + the r=100 ground SPHERE poking through the plane
                (band-cap + intersection-edge class)

Toggle intersect.SIL_FRESNEL to A/B the Schlick-coin score ratio.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/r5_estimator_grid.py
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

import simplepathtracer_tpu as spt  # noqa: E402
from simplepathtracer_tpu import inverse  # noqa: E402
from simplepathtracer_tpu.ops import intersect  # noqa: E402
from simplepathtracer_tpu.scenes import with_ground_plane  # noqa: E402
from simplepathtracer_tpu.types import Material  # noqa: E402


def variants():
    base = with_ground_plane(spt.three_sphere_scene(hollow_glass=False))
    base = base.replace(plane=jnp.asarray(base.plane).at[3].set(0.6))
    # Drop the giant ground sphere (slot 0) for the non-giant variants:
    # move it far below and shrink it so it never intersects anything.
    def no_ground(s):
        return s.replace(
            centers=s.centers.at[0].set(jnp.asarray([0.0, -1e4, 0.0])),
            radii=s.radii.at[0].set(1.0),
        )

    lamb = jnp.zeros_like(base.material)
    out = {
        "lambert": no_ground(base.replace(material=lamb)),
        "metal": no_ground(base.replace(material=lamb.at[2].set(
            int(Material.METAL)))),
        "glass": no_ground(base.replace(material=lamb.at[3].set(
            int(Material.DIELECTRIC)))),
        "giant": base.replace(material=lamb),
    }
    return out


def run(spp=256, width=96, height=48, depth=5, softness=0.05, rr=2,
        eps=1e-2, n_keys=4):
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60)
    cfg = spt.RenderConfig(width=width, height=height, spp=spp,
                           max_depth=depth, silhouette_softness=softness,
                           rr_start_depth=rr)
    target = jnp.full((height, width, 3), 0.3, jnp.float32)
    dk = jax.random.PRNGKey(42)
    for name, scene in variants().items():
        params, ss = inverse.split_params(scene)
        loss_fn = jax.jit(inverse.pixel_loss, static_argnames=("config",))
        gfn = jax.jit(jax.grad(inverse.pixel_loss),
                      static_argnames=("config",))
        v = {k: (jax.random.normal(jax.random.fold_in(dk, i),
                                   params[k].shape) * 0.1
                 if k in ("centers", "radii") else jnp.zeros_like(params[k]))
             for i, k in enumerate(sorted(params))}
        # The giant ground sphere's intersection-edge class is measured by
        # the 'giant' row itself; exclude it from the direction elsewhere.
        if name != "giant":
            v["centers"] = v["centers"].at[0].set(0.0)
            v["radii"] = v["radii"].at[0].set(0.0)
        ads, fds = [], []
        for s in range(n_keys):
            key = jax.random.PRNGKey(100 + s)
            g = gfn(params, ss, target, cam, cfg, key)
            ads.append(sum(float(jnp.vdot(g[k], v[k])) for k in g))
            pp = jax.tree.map(lambda p, d: p + eps * d, params, v)
            pm = jax.tree.map(lambda p, d: p - eps * d, params, v)
            fds.append((float(loss_fn(pp, ss, target, cam, cfg, key))
                        - float(loss_fn(pm, ss, target, cam, cfg, key)))
                       / (2 * eps))
        ad, fd = np.mean(ads), np.mean(fds)
        print(f"{name:8s} AD {ad:+.5e}±{np.std(ads)/np.sqrt(n_keys):.1e} "
              f"FD {fd:+.5e}±{np.std(fds)/np.sqrt(n_keys):.1e} "
              f"ratio {ad / fd:.3f}")


if __name__ == "__main__":
    for fres in (True, False):
        intersect.SIL_FRESNEL = fres
        print(f"--- SIL_FRESNEL={fres} ---")
        run()
