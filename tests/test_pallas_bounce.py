"""Pallas megakernel vs jnp reference path equivalence (interpret mode).

The bounce megakernel (ops/pallas_bounce.py) must reproduce the jnp bounce
loop (render.py trace_rays) to fp tolerance: identical threefry streams,
same material math, same masks.  Runs the kernel in Pallas interpret mode on
the CPU test backend.
"""

import jax
import numpy as np
import pytest

import simplepathtracer_tpu as spt


def _diff(scene, cam, cfg_kw):
    key = jax.random.PRNGKey(11)
    a = np.asarray(
        spt.render(scene, cam, spt.RenderConfig(**cfg_kw), key)
    )
    b = np.asarray(
        spt.render(
            scene, cam,
            spt.RenderConfig(**cfg_kw, use_pallas=True, pallas_interpret=True),
            key,
        )
    )
    return np.abs(a - b)


@pytest.mark.parametrize(
    "scene_fn,cam_kw",
    [
        (spt.three_sphere_scene, dict(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60)),
        (spt.reference_scene, dict(origin=(0, 1, -3), lookat=(0, 1, 0), vfov_deg=90)),
    ],
)
def test_megakernel_matches_jnp(scene_fn, cam_kw):
    scene = scene_fn()
    cam = spt.make_camera(**cam_kw)
    d = _diff(scene, cam, dict(width=48, height=24, spp=8, max_depth=8))
    # Knife-edge hits (disc ~ 0) may resolve differently between the two
    # discriminant formulations, flipping single stochastic samples; allow a
    # fraction of a percent of outlier channels but pin everything else.
    assert d.mean() < 1e-4, f"mean diff {d.mean()}"
    assert (d > 1e-4).mean() < 5e-3, f"outlier fraction {(d > 1e-4).mean()}"


def test_bounce_megakernel_direct_trace():
    """Direct coverage of the per-bounce megakernel path (trace_rays with
    use_pallas), independent of the persistent whole-render kernel."""
    import jax.numpy as jnp

    from simplepathtracer_tpu.ops.sampling import ray_keys
    from simplepathtracer_tpu.render import trace_rays, trace_rays_pallas

    scene = spt.three_sphere_scene()
    cfg = spt.RenderConfig(width=8, height=8, spp=1, max_depth=6,
                           pallas_interpret=True)
    key = jax.random.PRNGKey(2)
    n = 512
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    d = jax.random.normal(jax.random.PRNGKey(3), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ctx = ray_keys(key, jnp.arange(n), jnp.zeros(n, jnp.int32))
    a = np.asarray(trace_rays(o, d, ctx, scene, cfg))
    b = np.asarray(trace_rays_pallas(o, d, ctx, scene, cfg))
    diff = np.abs(a - b)
    assert diff.mean() < 1e-4, diff.mean()
    assert (diff > 1e-3).mean() < 5e-3


def test_megakernel_nonmultiple_block_padding():
    # 37*13 pixels: exercises the pad-to-1024 path.
    scene = spt.simple_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1))
    d = _diff(scene, cam, dict(width=37, height=13, spp=4, max_depth=4))
    assert d.max() < 1e-4, f"max diff {d.max()}"


def test_closest_hit_kernel_matches_jnp_intersect():
    import jax.numpy as jnp

    from simplepathtracer_tpu.ops.intersect import intersect_scene, intersect_scene_pallas

    scene = spt.cover_scene(jax.random.PRNGKey(0), max_spheres=128)
    o = jax.random.uniform(jax.random.PRNGKey(1), (2000, 3), minval=-5, maxval=15)
    d = jax.random.normal(jax.random.PRNGKey(2), (2000, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    h1 = intersect_scene(o, d, scene)
    h2 = intersect_scene_pallas(o, d, jnp.ones((2000,), bool), scene, interpret=True)
    np.testing.assert_array_equal(np.asarray(h1.hit), np.asarray(h2.hit))
    hits = np.asarray(h1.hit)
    np.testing.assert_array_equal(np.asarray(h1.index)[hits], np.asarray(h2.index)[hits])
    np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), atol=5e-3, rtol=1e-4)
