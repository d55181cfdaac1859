"""Fused Pallas gradient path (ops/pallas_grad.py) vs the jnp bounce.

The fused path runs the forward bounce AND its adjoint as Pallas kernels
(jax.vjp traced inside the kernel body); its radiance must match the jnp
path to fp tolerance and its gradients must match the jnp autodiff
gradients leaf by leaf.  All kernels run in interpret mode on the CPU test
backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import inverse


def _setup(rr_start_depth=0):
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60)
    cfg = spt.RenderConfig(
        width=48, height=24, spp=2, max_depth=5, rr_start_depth=rr_start_depth
    )
    fused = cfg.replace(use_pallas_grad=True, pallas_interpret=True)
    key = jax.random.PRNGKey(7)
    scene = spt.three_sphere_scene(hollow_glass=True)
    return scene, cam, cfg, fused, key


def _grads(scene, cam, cfg, key, leaves=inverse.DIFF_LEAVES):
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    params, static_scene = inverse.split_params(scene, leaves)
    loss, grads = jax.value_and_grad(inverse.pixel_loss)(
        params, static_scene, target, cam, cfg, key, leaves
    )
    return float(loss), {k: np.asarray(v) for k, v in grads.items()}


def _rel_l2(a, b):
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def test_forward_matches_jnp():
    scene, cam, cfg, fused, key = _setup()
    a = np.asarray(spt.render(scene, cam, cfg, key))
    b = np.asarray(spt.render(scene, cam, fused, key))
    d = np.abs(a - b)
    assert d.mean() < 1e-4, f"mean diff {d.mean()}"
    assert (d > 1e-4).mean() < 5e-3, f"outlier fraction {(d > 1e-4).mean()}"


@pytest.mark.parametrize("rr", [0, 2])
def test_gradients_match_jnp(rr):
    scene, cam, cfg, fused, key = _setup(rr_start_depth=rr)
    loss_ref, g_ref = _grads(scene, cam, cfg, key)
    loss_fused, g_fused = _grads(scene, cam, fused, key)
    assert abs(loss_fused - loss_ref) < 1e-5 + 1e-3 * abs(loss_ref)
    for k in g_ref:
        assert np.isfinite(g_fused[k]).all(), f"non-finite grad for {k}"
        err = _rel_l2(g_fused[k], g_ref[k])
        assert err < 2e-3, f"leaf {k}: relative L2 grad error {err}"


def test_gradients_match_jnp_cover_slice():
    """Many-sphere scene: exercises table padding + bucket accumulation."""
    scene = spt.cover_scene(jax.random.PRNGKey(0), max_spheres=40)
    cam = spt.make_camera(origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20)
    cfg = spt.RenderConfig(width=32, height=32, spp=1, max_depth=4)
    fused = cfg.replace(use_pallas_grad=True, pallas_interpret=True)
    key = jax.random.PRNGKey(3)
    _, g_ref = _grads(scene, cam, cfg, key)
    _, g_fused = _grads(scene, cam, fused, key)
    for k in g_ref:
        assert np.isfinite(g_fused[k]).all(), f"non-finite grad for {k}"
        err = _rel_l2(g_fused[k], g_ref[k])
        # 5e-3 (vs 2e-3 above): the ground sphere accumulates thousands of
        # contributions, and the MXU bucket matmul sums them in a different
        # order than jnp's segment sum — measured |diff| is ~3e-4 on that one
        # row (fp noise), ~2e-3 relative L2 overall.
        assert err < 5e-3, f"leaf {k}: relative L2 grad error {err}"


def test_silhouette_blend_composes():
    """silhouette_softness applies on top of the fused trace (geometry fits)."""
    scene, cam, cfg, fused, key = _setup()
    cfg = cfg.replace(silhouette_softness=0.02)
    fused = fused.replace(silhouette_softness=0.02)
    loss_ref, g_ref = _grads(scene, cam, cfg, key, leaves=("centers", "radii"))
    loss_fused, g_fused = _grads(scene, cam, fused, key, leaves=("centers", "radii"))
    assert abs(loss_fused - loss_ref) < 1e-5 + 1e-3 * abs(loss_ref)
    for k in g_ref:
        err = _rel_l2(g_fused[k], g_ref[k])
        assert err < 2e-3, f"leaf {k}: relative L2 grad error {err}"


def test_grad_safe_config_prefers_fused():
    cfg = spt.RenderConfig(use_pallas=True, pallas_interpret=True)
    from simplepathtracer_tpu.render import grad_safe_config

    safe = grad_safe_config(cfg)
    assert not safe.use_pallas
    assert safe.use_pallas_grad
    # Regeneration kernels are the default gradient path on kernel
    # backends (2x the per-bounce fused path, BENCH_r03); scenes the regen
    # path can't serve (plane, soft silhouettes) fall back per-call in
    # render_pixel_block.
    assert safe.grad_regen


def test_sharded_train_step_fused():
    """The fused custom-vjp path must compile and run under shard_map."""
    from simplepathtracer_tpu.parallel import sharding

    scene, cam, cfg, fused, key = _setup()
    mesh = sharding.make_mesh(tiles=4, samples=2)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    loss_ref, grads_ref = sharding.loss_and_grad_sharded(
        scene, target, cam, cfg, key, mesh
    )
    loss_fused, grads_fused = sharding.loss_and_grad_sharded(
        scene, target, cam, fused, key, mesh
    )
    assert abs(float(loss_fused) - float(loss_ref)) < 1e-5 + 1e-3 * abs(
        float(loss_ref)
    )
    for k in grads_ref:
        err = _rel_l2(np.asarray(grads_fused[k]), np.asarray(grads_ref[k]))
        assert err < 2e-3, f"leaf {k}: relative L2 grad error {err}"


def test_coherent_pixel_order_roundtrip():
    """Tile reorder is a bijection and unpermute inverts it exactly."""
    from simplepathtracer_tpu.render import _coherent_pixel_order

    cfg = spt.RenderConfig(width=48, height=24, spp=1)
    pids0 = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    pids, unperm = _coherent_pixel_order(pids0, cfg)
    assert sorted(np.asarray(pids).tolist()) == list(range(cfg.num_pixels))
    # Scatter each ray's own pixel id as its "radiance": after unpermute,
    # entry p must hold p.
    rad = jnp.stack([pids.astype(jnp.float32)] * 3, axis=-1)
    out = np.asarray(unperm(rad))
    np.testing.assert_array_equal(out[:, 0], np.arange(cfg.num_pixels))

    # Non-row-aligned block: identity fallback.
    odd = jnp.arange(100, dtype=jnp.int32)
    pids2, unperm2 = _coherent_pixel_order(odd, cfg)
    np.testing.assert_array_equal(np.asarray(pids2), np.asarray(odd))


def test_raygen_kernel_matches_generate_rays():
    """The raygen kernel == camera_jitter + generate_rays, ray by ray."""
    from simplepathtracer_tpu.ops.pallas_grad import raygen_tiles
    from simplepathtracer_tpu.ops.sampling import camera_jitter, ray_keys
    from simplepathtracer_tpu.camera import generate_rays

    cam = spt.make_camera(
        origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20,
        aperture=0.1, focus_dist=10.0,
    )
    cfg = spt.RenderConfig(width=40, height=30, spp=2, pallas_interpret=True)
    n = cfg.num_pixels * 2
    pids = jnp.tile(jnp.arange(cfg.num_pixels, dtype=jnp.int32), (2,))
    sids = jnp.repeat(jnp.arange(2, dtype=jnp.int32), cfg.num_pixels)
    keys = ray_keys(jax.random.PRNGKey(9), pids, sids)

    jit4 = camera_jitter(keys)
    origins, dirs = generate_rays(cam, cfg.width, cfg.height, pids, jit4)

    tiles = [np.asarray(t).reshape(-1)[:n] for t in raygen_tiles(cam, keys, cfg)]
    ref = [np.asarray(origins[:, i]) for i in range(3)] + [
        np.asarray(dirs[:, i]) for i in range(3)
    ]
    for got, want in zip(tiles, ref):
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6)
