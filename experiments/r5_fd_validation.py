"""Round-5 on-chip directional FD validation of the TWO-SIDED silhouette
gradients (compiled Mosaic, regen/stream path).

Successor to r4_fd_validation.py, decomposed by discontinuity class — the
round-4 one-sided blend measured geometry AD/FD = 0.49; the round-5
stochastic-transparency estimator (shared acceptance coin + blocker
tracking + detached probability ratio) captures both sides of visibility
edges, so Lambertian-geometry AD/FD should sit in [0.9, 1.1].  Specular
chains add BSDF-coin discontinuity classes (Schlick coin / TIR gate /
mirror-image edges) that are a separate axis: the Schlick score ratio is
implemented (intersect.SIL_FRESNEL) but measured heavy-tailed and ships
default-off; the residual is reported here, not hidden.

Classes (each on with_ground_plane(three spheres), plane k=0.6, soft 0.05,
RR 2, 256x128@64spp depth 6, regen kernels):

  smooth     albedo + sky + plane offset/albedo (detached normal dropped)
  lambert    centers+radii of the three object spheres, ALL Lambertian
  metal      same direction, metal sphere restored
  glass      same direction, dielectric sphere restored
  giant      the r=100 ground sphere's own center+radius (radius-capped
             band; its plane-intersection edge class remains unsmoothed)
  camera     vfov zoom on the Lambertian variant (fused path, camera_grad)

Run on a TPU-attached session: python experiments/r5_fd_validation.py
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
from simplepathtracer_tpu.types import Material  # noqa: E402


def base_scene():
    s = with_ground_plane(spt.three_sphere_scene(hollow_glass=False))
    return s.replace(plane=jnp.asarray(s.plane).at[3].set(0.6))


def main(width=256, height=128, spp=64, depth=6, softness=0.05, rr=2,
         eps=1e-2, n_keys=2):
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60)
    cfg = spt.RenderConfig(
        width=width, height=height, spp=spp, max_depth=depth,
        use_pallas_grad=True, grad_regen=True,
        silhouette_softness=softness, rr_start_depth=rr,
    )
    target = jnp.full((height, width, 3), 0.3, jnp.float32)
    dk = jax.random.PRNGKey(42)
    base = base_scene()
    lamb = jnp.zeros_like(base.material)
    variants = {
        "lambert": base.replace(material=lamb),
        "metal": base.replace(material=lamb.at[2].set(int(Material.METAL))),
        "glass": base.replace(
            material=lamb.at[3].set(int(Material.DIELECTRIC))),
    }

    loss_fn = jax.jit(inverse.pixel_loss, static_argnames=("config",))
    gfn = jax.jit(jax.grad(inverse.pixel_loss), static_argnames=("config",))

    def check(scene, v, label):
        params, ss = inverse.split_params(scene)
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
        print(f"{label:8s} AD {ad:+.6g} FD {fd:+.6g} ratio {ad / fd:.3f}",
              flush=True)
        return ad / fd

    def geom_dir(params, object_only=True, giant_only=False):
        v = {k: (jax.random.normal(jax.random.fold_in(dk, i),
                                   params[k].shape) * 0.1
                 if k in ("centers", "radii") else jnp.zeros_like(params[k]))
             for i, k in enumerate(sorted(params))}
        if object_only:
            v["centers"] = v["centers"].at[0].set(0.0)
            v["radii"] = v["radii"].at[0].set(0.0)
        if giant_only:
            m = jnp.zeros_like(v["centers"]).at[0, :].set(1.0)
            v["centers"] = v["centers"] * m
            v["radii"] = v["radii"] * jnp.zeros_like(v["radii"]).at[0].set(1.0)
        return v

    # Smooth leaves on the Lambertian variant.
    params, _ = inverse.split_params(variants["lambert"])
    v_smooth = {
        k: (jax.random.normal(jax.random.fold_in(dk, 7 + i),
                              params[k].shape) * 0.3
            if k in ("albedo", "sky_lo", "sky_hi", "plane")
            else jnp.zeros_like(params[k]))
        for i, k in enumerate(sorted(params))
    }
    v_smooth["plane"] = v_smooth["plane"].at[:3].set(0.0)
    check(variants["lambert"], v_smooth, "smooth")

    ratios = {}
    for name in ("lambert", "metal", "glass"):
        params, _ = inverse.split_params(variants[name])
        ratios[name] = check(variants[name], geom_dir(params), name)
    # Headline: the ORIGINAL material trio (metal AND glass), object-only
    # direction — measured 1.056 on chip (round-4 one-sided blend: 0.49).
    params, _ = inverse.split_params(base)
    check(base, geom_dir(params), "trio")
    params, _ = inverse.split_params(variants["lambert"])
    check(variants["lambert"], geom_dir(params, object_only=False,
                                        giant_only=True), "giant")

    # Camera vfov (fused path, Lambertian).
    ccfg = cfg.replace(grad_regen=False)
    scene = variants["lambert"]
    cparams, cam0 = inverse.split_camera(cam)

    def closs(p, k):
        return inverse.camera_pixel_loss(p, cam0, scene, target, ccfg, k)

    closs_j = jax.jit(closs)
    ads, fds = [], []
    for s in range(n_keys):
        key = jax.random.PRNGKey(100 + s)
        g = jax.jit(jax.grad(closs))(cparams, key)
        ads.append(float(g["vfov_deg"]))
        e = 0.05
        up = dict(cparams, vfov_deg=cparams["vfov_deg"] + e)
        dn = dict(cparams, vfov_deg=cparams["vfov_deg"] - e)
        fds.append((float(closs_j(up, key)) - float(closs_j(dn, key)))
                   / (2 * e))
    print(f"camera   AD {np.mean(ads):+.6g} FD {np.mean(fds):+.6g} "
          f"ratio {np.mean(ads) / np.mean(fds):.3f}", flush=True)


if __name__ == "__main__":
    main()
