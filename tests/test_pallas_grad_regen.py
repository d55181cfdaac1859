"""Regeneration-based fused gradient path (ops/pallas_grad_regen.py) vs the
jnp reference bounce — values AND gradients, in Pallas interpret mode.

The regen kernels share bounce_tile/closest_hit_scan with the per-bounce
fused path and the same threefry streams keyed by global (pixel, sample)
ids, so radiance and gradients must match the jnp path to fp tolerance for
every configuration: multi-bank/multi-block layouts, ragged pixel counts
(padding lanes), Russian roulette, spp chunking, and the sharded trainer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import inverse


def _setup(width=16, height=8, spp=4, depth=4, **cfg_kw):
    scene = spt.three_sphere_scene(hollow_glass=False)
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60)
    cfg = spt.RenderConfig(width=width, height=height, spp=spp,
                           max_depth=depth, **cfg_kw)
    key = jax.random.PRNGKey(2)
    return scene, cam, cfg, key


def _regen(cfg):
    return cfg.replace(use_pallas_grad=True, grad_regen=True,
                       pallas_interpret=True)


def _assert_images_close(a, b, tol=2e-6):
    d = np.abs(np.asarray(a) - np.asarray(b))
    assert d.mean() < tol and d.max() < 1e-3, (d.mean(), d.max())


def test_regen_forward_matches_jnp():
    scene, cam, cfg, key = _setup()
    img_j = inverse.render_linear(scene, cam, cfg, key)
    img_r = inverse.render_linear(scene, cam, _regen(cfg), key)
    _assert_images_close(img_j, img_r)


def test_regen_forward_multiblock_multibank():
    # 64x40 = 2560 pixels -> 2 banks, padded lanes (1280 -> 2048): exercises
    # bank selection, block padding, AND the overflow-position duplicates.
    scene, cam, cfg, key = _setup(width=64, height=40, spp=2, depth=5)
    img_j = inverse.render_linear(scene, cam, cfg, key)
    img_r = inverse.render_linear(scene, cam, _regen(cfg), key)
    _assert_images_close(img_j, img_r)


def test_regen_forward_russian_roulette():
    scene, cam, cfg, key = _setup(spp=4, depth=6, rr_start_depth=2)
    img_j = inverse.render_linear(scene, cam, cfg, key)
    img_r = inverse.render_linear(scene, cam, _regen(cfg), key)
    _assert_images_close(img_j, img_r)


def _grads(scene, cam, cfg, key, target):
    params, static_scene = inverse.split_params(scene)
    return jax.value_and_grad(inverse.pixel_loss)(
        params, static_scene, target, cam, cfg, key
    )


@pytest.mark.parametrize("rr", [0, 2])
def test_regen_gradients_match_jnp(rr):
    scene, cam, cfg, key = _setup(depth=4, rr_start_depth=rr)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_j, g_j = _grads(scene, cam, cfg, key, target)
    l_r, g_r = _grads(scene, cam, _regen(cfg), key, target)
    np.testing.assert_allclose(float(l_j), float(l_r), rtol=1e-6)
    for k in g_j:
        a, b = np.asarray(g_j[k]), np.asarray(g_r[k])
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-6, err_msg=k)


def test_regen_gradients_multichunk_spp():
    """spp chunking (the remat path) around the regen kernels: spp=6 with
    spp_chunk=2 -> 3 rematerialized chunks, each a regen kernel call."""
    scene, cam, cfg, key = _setup(spp=6, depth=4, spp_chunk=2)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_j, g_j = _grads(scene, cam, cfg, key, target)
    l_r, g_r = _grads(scene, cam, _regen(cfg), key, target)
    np.testing.assert_allclose(float(l_j), float(l_r), rtol=1e-6)
    for k in g_j:
        a, b = np.asarray(g_j[k]), np.asarray(g_r[k])
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-6, err_msg=k)


def test_regen_matches_perbounce_fused():
    """The two fused implementations (per-bounce sweep vs regeneration)
    share tile physics and must agree with each other tightly."""
    scene, cam, cfg, key = _setup(width=32, height=16, spp=3, depth=5)
    target = jnp.full((cfg.height, cfg.width, 3), 0.3, jnp.float32)
    cfg_pb = cfg.replace(use_pallas_grad=True, pallas_interpret=True)
    l_p, g_p = _grads(scene, cam, cfg_pb, key, target)
    l_r, g_r = _grads(scene, cam, _regen(cfg), key, target)
    np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-6)
    for k in g_p:
        a, b = np.asarray(g_p[k]), np.asarray(g_r[k])
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-6, err_msg=k)


def test_regen_sharded_train_step():
    """grad_regen inside shard_map: the sharded loss/grads must equal the
    single-device jnp values (mesh cannot change the math)."""
    from simplepathtracer_tpu.parallel import make_mesh
    from simplepathtracer_tpu.parallel.sharding import loss_and_grad_sharded

    scene, cam, cfg, key = _setup(width=32, height=16, spp=4, depth=4)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    mesh = make_mesh(tiles=2, samples=2, devices=jax.devices()[:4])
    cfg_r = _regen(cfg)
    loss_s, grads_s = jax.jit(
        lambda s, t, c, k: loss_and_grad_sharded(s, t, c, cfg_r, k, mesh)
    )(scene, target, cam, key)
    params, static_scene = inverse.split_params(scene)
    loss_j, grads_j = jax.value_and_grad(inverse.pixel_loss)(
        params, static_scene, target, cam, cfg, key
    )
    np.testing.assert_allclose(float(loss_s), float(loss_j), rtol=1e-5)
    for k in grads_j:
        a, b = np.asarray(grads_j[k]), np.asarray(grads_s[k])
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-6, err_msg=k)


def test_regen_fit_recovers_albedo():
    """End-to-end: an inverse fit through the regen path still optimizes."""
    scene, cam, cfg, key = _setup(width=24, height=12, spp=4, depth=3)
    target = inverse.render_linear(scene, cam, cfg, jax.random.fold_in(key, 9))
    perturbed = scene.replace(albedo=jnp.clip(scene.albedo + 0.25, 0.05, 0.95))
    recovered, losses = inverse.fit(
        perturbed, target, cam, _regen(cfg), key, steps=12, lr=5e-2,
        leaves=("albedo",),
    )
    assert losses[-1] < losses[0] * 0.7, losses[::4]


def test_regen_iteration_counts():
    """Per-lane live-iteration diagnostics: total live iterations must be
    bounded by chains * max_depth and at least chains (every chain runs at
    least one bounce)."""
    from simplepathtracer_tpu.ops.pallas_grad_regen import render_block_grad_regen

    scene, cam, cfg, key = _setup(width=64, height=32, spp=2, depth=5)
    pids = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    img, counts = render_block_grad_regen(
        scene, cam, _regen(cfg), key, pids, 0, cfg.spp, return_counts=True
    )
    total = float(jnp.sum(counts))
    chains = cfg.num_pixels * cfg.spp
    assert chains <= total <= chains * cfg.max_depth, (total, chains)
    # Straggler factor over blocks must be finite and sane.
    blocks = counts.reshape(-1, 1024)
    ratio = float(jnp.max(jnp.max(blocks, 1) / jnp.mean(blocks, 1)))
    assert 1.0 <= ratio < 3.0, ratio


def test_regen_fit_balanced_matches_unbalanced():
    """balance=True renders in cost-balanced pixel order: lane placement
    changes, values don't — the fit trajectory must match the unbalanced
    one step for step (same keys, same sample set, fp-tolerance losses)."""
    scene, cam, cfg, key = _setup(width=32, height=16, spp=2, depth=4)
    cfg_r = _regen(cfg)
    target = inverse.render_linear(scene, cam, cfg, jax.random.fold_in(key, 9))
    perturbed = scene.replace(albedo=jnp.clip(scene.albedo + 0.2, 0.05, 0.95))
    _, losses_u = inverse.fit(
        perturbed, target, cam, cfg_r, key, steps=4, lr=3e-2, leaves=("albedo",)
    )
    _, losses_b = inverse.fit(
        perturbed, target, cam, cfg_r, key, steps=4, lr=3e-2, leaves=("albedo",),
        balance=True,
    )
    np.testing.assert_allclose(losses_b, losses_u, rtol=1e-4)


def test_regen_finite_difference_albedo():
    """Direct FD validation of the regen path's autodiff (not just
    equivalence-by-proxy with the jnp bounce)."""
    scene, cam, _, key = _setup()
    cfg = spt.RenderConfig(width=32, height=16, spp=8, max_depth=4,
                           use_pallas_grad=True, grad_regen=True,
                           pallas_interpret=True)
    params, static_scene = inverse.split_params(scene, ("albedo",))
    target = jnp.full((16, 32, 3), 0.25, jnp.float32)

    def f(albedo):
        return inverse.pixel_loss(
            {"albedo": albedo}, static_scene, target, cam, cfg, key, ("albedo",)
        )

    g = jax.grad(f)(params["albedo"])
    eps = 1e-3
    e = jnp.zeros_like(params["albedo"]).at[1, 0].set(1.0)
    fd = float((f(params["albedo"] + eps * e) - f(params["albedo"] - eps * e))
               / (2 * eps))
    ad = float(jnp.vdot(g, e))
    # f32 central differences at eps=1e-3 carry ~1e-5 truncation/rounding.
    assert abs(ad - fd) < 2e-2 * abs(fd) + 2e-5, (ad, fd)


def test_regen_bench_like_depth10():
    """Bench-shaped chunk count (depth 10, 8 banks -> 40 sequential grid
    steps): values still match the jnp bounce.  At depth 10 knife-edge
    grazing hits can flip between fp orderings (CLAUDE.md), so this uses
    the mean + outlier-fraction bounds of the kernel equivalence suite."""
    scene, cam, cfg, key = _setup(width=128, height=64, spp=4, depth=10)
    img_j = np.asarray(inverse.render_linear(scene, cam, cfg, key))
    img_r = np.asarray(inverse.render_linear(scene, cam, _regen(cfg), key))
    d = np.abs(img_j - img_r)
    assert d.mean() < 1e-4, d.mean()
    assert (d > 1e-2).mean() < 1e-3, (d > 1e-2).mean()


def test_stream_matches_chunked_remat():
    """The streamed-idx path (grad_regen_stream, the default when spp
    chunking is active) must reproduce the chunked-remat path's loss
    exactly (identical forward kernel code) and its gradients to fp
    accumulation tolerance (same per-chunk backward, same bucket order)."""
    scene, cam, cfg, key = _setup(width=32, height=16, spp=6, depth=5,
                                  spp_chunk=2)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_s, g_s = _grads(scene, cam, _regen(cfg), key, target)
    l_c, g_c = _grads(
        scene, cam, _regen(cfg).replace(grad_regen_stream=False), key, target
    )
    assert float(l_s) == float(l_c), (float(l_s), float(l_c))
    for k in g_s:
        a, b = np.asarray(g_c[k]), np.asarray(g_s[k])
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7, err_msg=k)


def test_stream_sharded_train_step():
    """Streamed-idx inside shard_map (chunked spp on the samples axis)."""
    from simplepathtracer_tpu.parallel import make_mesh
    from simplepathtracer_tpu.parallel.sharding import loss_and_grad_sharded

    scene, cam, cfg, key = _setup(width=32, height=16, spp=8, depth=4,
                                  spp_chunk=2)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    mesh = make_mesh(tiles=2, samples=2, devices=jax.devices()[:4])
    cfg_r = _regen(cfg)
    loss_s, grads_s = jax.jit(
        lambda s, t, c, k: loss_and_grad_sharded(s, t, c, cfg_r, k, mesh)
    )(scene, target, cam, key)
    params, static_scene = inverse.split_params(scene)
    loss_j, grads_j = jax.value_and_grad(inverse.pixel_loss)(
        params, static_scene, target, cam, cfg, key
    )
    np.testing.assert_allclose(float(loss_s), float(loss_j), rtol=1e-5)
    for k in grads_j:
        a, b = np.asarray(grads_j[k]), np.asarray(grads_s[k])
        np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-6, err_msg=k)


def test_stream_russian_roulette_grads():
    """RR termination is part of the replayed state machine: streamed
    gradients must still match the jnp bounce with rr_start_depth set."""
    scene, cam, cfg, key = _setup(spp=4, depth=6, rr_start_depth=2,
                                  spp_chunk=2)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_j, g_j = _grads(scene, cam, cfg, key, target)
    l_s, g_s = _grads(scene, cam, _regen(cfg), key, target)
    np.testing.assert_allclose(float(l_j), float(l_s), rtol=1e-6)
    for k in g_j:
        a, b = np.asarray(g_j[k]), np.asarray(g_s[k])
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-6, err_msg=k)


def test_stream_capacity_fallback(monkeypatch):
    """Past the idx-plane memory budget the stream path must fall back to
    chunked remat transparently (same loss, same gradients)."""
    import sys

    render_mod = sys.modules["simplepathtracer_tpu.render"]
    scene, cam, cfg, key = _setup(width=32, height=16, spp=4, depth=4,
                                  spp_chunk=2)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_s, g_s = _grads(scene, cam, _regen(cfg), key, target)
    monkeypatch.setattr(render_mod, "_IDX_PLANE_BUDGET", 0)
    l_f, g_f = _grads(scene, cam, _regen(cfg), key, target)
    assert float(l_s) == float(l_f)
    for k in g_s:
        np.testing.assert_allclose(
            np.asarray(g_f[k]), np.asarray(g_s[k]), rtol=1e-5, atol=1e-7,
            err_msg=k,
        )


def test_stream_packed_capacity_engages(monkeypatch):
    """Round-4 idx packing (3 x 10-bit winners per i32 word) triples the
    streamed path's spp capacity: with a budget between the packed and the
    round-3 unpacked plane size, the stream path must ENGAGE (not fall back
    to remat) and still match the remat gradients.  This is the small-scale
    proxy for the 500-spp north-star workload, which exceeds the round-3
    gate (spp <= ~167 at bench shape) but fits packed (~500)."""
    import sys

    from simplepathtracer_tpu.ops import pallas_grad_regen as regen_mod

    render_mod = sys.modules["simplepathtracer_tpu.render"]
    scene, cam, cfg, key = _setup(width=32, height=16, spp=6, depth=5,
                                  spp_chunk=2)
    p = cfg.num_pixels
    unpacked = 4 * p * cfg.spp * cfg.max_depth
    # Budget exactly the PACKED plane size: the round-3 unpacked gate
    # (bytes <= budget) would reject, the packed gate (bytes <= 3 * budget)
    # accepts.
    assert regen_mod._IDX_PACK == 3
    monkeypatch.setattr(render_mod, "_IDX_PLANE_BUDGET", unpacked // 3)

    calls = []
    orig = regen_mod.render_block_grad_regen_stream

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(regen_mod, "render_block_grad_regen_stream", spy)
    # render.py imports the symbol lazily inside render_pixel_block, so the
    # module-attr patch on regen_mod is the one that intercepts.
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_s, g_s = _grads(scene, cam, _regen(cfg), key, target)
    assert calls, "stream path did not engage at packed-capacity shape"
    l_c, g_c = _grads(
        scene, cam, _regen(cfg).replace(grad_regen_stream=False), key, target
    )
    assert float(l_s) == float(l_c)
    for k in g_s:
        np.testing.assert_allclose(
            np.asarray(g_c[k]), np.asarray(g_s[k]), rtol=1e-5, atol=1e-7,
            err_msg=k,
        )


def test_stream_idx_above_8bit():
    """Winner indices above 255 must survive the 10-bit pack/unpack: a
    ~484-sphere cover scene exercises high idx fields (a width bug would
    corrupt every high-index winner's replayed attributes)."""
    from simplepathtracer_tpu.scenes import compact_scene

    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    assert scene.num_spheres > 255
    cam = spt.make_camera(
        origin=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0), vfov_deg=20.0,
        aperture=0.1, focus_dist=10.0,
    )
    cfg = spt.RenderConfig(width=16, height=8, spp=4, max_depth=3,
                           spp_chunk=2)
    key = jax.random.PRNGKey(5)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    # Reference: a checkpoint-FREE python-loop over the same regen chunk
    # calls.  (The production remat path wraps chunks in jax.checkpoint,
    # whose replayed forward can flip knife-edge winners at a 484-sphere
    # scene — XLA refuses the identical fusion in the remat context —
    # shifting gradient mass between near-twin spheres.  The streamed path
    # replays RECORDED winners, so it matches the un-rematerialized
    # gradients exactly; asserting that is the stronger check.)
    from simplepathtracer_tpu.ops import pallas_grad_regen as regen_mod

    pids = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    params, static_scene = inverse.split_params(scene)

    def loss_loop(params):
        s = scene.replace(**params)
        rcfg = _regen(cfg)
        acc = sum(
            regen_mod.render_block_grad_regen(s, cam, rcfg, key, pids, off, 2)
            for off in range(0, cfg.spp, 2)
        )
        img = (acc / cfg.spp).reshape(cfg.height, cfg.width, 3)
        return jnp.mean((img - target) ** 2)

    l_s, g_s = _grads(scene, cam, _regen(cfg), key, target)
    l_c, g_c = jax.value_and_grad(loss_loop)(params)
    assert float(l_s) == float(l_c), (float(l_s), float(l_c))
    for k in g_s:
        a, b = np.asarray(g_c[k]), np.asarray(g_s[k])
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7, err_msg=k)


def test_beyond_capacity_fallback_deterministic(monkeypatch):
    """Round-5 VERDICT item 4: past streamed-idx capacity the fallback is
    the DETERMINISTIC checkpointed stream (idx planes re-recorded per
    chunk in the backward by the same Mosaic binary as the value pass),
    not jax.checkpoint remat (whose replayed forward was a different XLA
    program that could flip knife-edge winners at this ~484-sphere scene,
    moving gradient mass between near-twin spheres).  The fallback must
    match the in-capacity streamed path BIT-FOR-BIT: same forward kernels,
    same per-chunk backward accumulation schedule, only the idx-plane
    lifetime differs."""
    import importlib

    render_mod = importlib.import_module("simplepathtracer_tpu.render")
    from simplepathtracer_tpu.scenes import compact_scene

    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    cam = spt.make_camera(
        origin=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0), vfov_deg=20.0,
        aperture=0.1, focus_dist=10.0,
    )
    cfg = spt.RenderConfig(width=16, height=8, spp=4, max_depth=3,
                           spp_chunk=2)
    key = jax.random.PRNGKey(5)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_s, g_s = _grads(scene, cam, _regen(cfg), key, target)
    # Shrink the idx-plane budget so the same config no longer "fits".
    monkeypatch.setattr(render_mod, "_IDX_PLANE_BUDGET", 1)
    assert render_mod.stream_capacity_spp(cfg, scene) < cfg.spp
    l_f, g_f = _grads(scene, cam, _regen(cfg), key, target)
    assert float(l_s) == float(l_f), (float(l_s), float(l_f))
    for k in g_s:
        np.testing.assert_array_equal(
            np.asarray(g_s[k]), np.asarray(g_f[k]), err_msg=k
        )


def test_regen_silhouette_gradients_match_jnp():
    """Round-4: the soft-silhouette blend lives inside bounce_tile, so the
    regen kernels serve geometry fits directly (no per-bounce-path detour,
    no jnp re-scan).  Visibility gradients must match the jnp bounce."""
    scene, cam, cfg, key = _setup(depth=4, silhouette_softness=0.05)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    params, static_scene = inverse.split_params(scene, ("centers", "radii"))

    def grads(c):
        return jax.value_and_grad(inverse.pixel_loss)(
            params, static_scene, target, cam, c, key, ("centers", "radii")
        )

    l_j, g_j = grads(cfg)
    l_r, g_r = grads(_regen(cfg))
    np.testing.assert_allclose(float(l_j), float(l_r), rtol=1e-6)
    for k in g_j:
        a, b = np.asarray(g_j[k]), np.asarray(g_r[k])
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-6, err_msg=k)


def test_stream_silhouette_matches_remat():
    """Streamed-idx path under soft silhouettes (now allowed): loss
    bit-identical to chunked remat, gradients to accumulation tolerance."""
    scene, cam, cfg, key = _setup(width=32, height=16, spp=6, depth=5,
                                  spp_chunk=2, silhouette_softness=0.05)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_s, g_s = _grads(scene, cam, _regen(cfg), key, target)
    l_c, g_c = _grads(
        scene, cam, _regen(cfg).replace(grad_regen_stream=False), key, target
    )
    assert float(l_s) == float(l_c), (float(l_s), float(l_c))
    for k in g_s:
        a, b = np.asarray(g_c[k]), np.asarray(g_s[k])
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7, err_msg=k)


def test_regen_silhouette_fit_recovers_center():
    """End-to-end geometry recovery THROUGH THE REGEN KERNELS: perturb one
    sphere's center, fit it back with soft silhouettes (soft-to-soft)."""
    scene, cam, cfg, key = _setup(width=48, height=24, spp=8, depth=3)
    soft = 0.05
    target = inverse.render_linear(
        scene, cam, _regen(cfg).replace(silhouette_softness=soft),
        jax.random.fold_in(key, 9),
    )
    perturbed = scene.replace(
        centers=scene.centers.at[1].add(jnp.asarray([0.12, 0.08, 0.0]))
    )
    mask = {"centers": jnp.zeros_like(scene.centers).at[1].set(1.0)}
    recovered, losses = inverse.fit(
        perturbed, target, cam, _regen(cfg), key, steps=24, lr=2e-2,
        leaves=("centers",), softness=soft, param_mask=mask,
    )
    err0 = float(jnp.abs(perturbed.centers - scene.centers).max())
    err1 = float(jnp.abs(recovered.centers - scene.centers).max())
    assert err1 < err0 * 0.5, (err0, err1, losses[::6])


def _plane_setup(**kw):
    from simplepathtracer_tpu.scenes import with_ground_plane

    scene, cam, cfg, key = _setup(**kw)
    scene = with_ground_plane(scene)
    # Drop the plane a little below the spheres' resting tangent (y=-0.5):
    # exact tangency makes the whole contact circle a plane-vs-sphere fp
    # tie, and jnp/kernel orderings flip winners all along it.
    scene = scene.replace(plane=jnp.asarray(scene.plane).at[3].set(0.6))
    return scene, cam, cfg, jax.random.PRNGKey(7)


def test_plane_regen_forward_matches_jnp():
    """Ground-plane scenes route through the regen kernels since round 4
    (virtual-unit-sphere winner, PLANE_IDX code)."""
    scene, cam, cfg, key = _plane_setup()
    img_j = inverse.render_linear(scene, cam, cfg, key)
    img_r = inverse.render_linear(scene, cam, _regen(cfg), key)
    _assert_images_close(img_j, img_r)


def test_plane_regen_gradients_match_jnp():
    """Plane-scene gradients — all sphere leaves AND the plane leaf
    (offset + albedo; the unit normal is detached in every path)."""
    scene, cam, cfg, key = _plane_setup(depth=4)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_j, g_j = _grads(scene, cam, cfg, key, target)
    l_r, g_r = _grads(scene, cam, _regen(cfg), key, target)
    np.testing.assert_allclose(float(l_j), float(l_r), rtol=1e-5)
    assert np.abs(np.asarray(g_j["plane"][:3])).max() == 0.0  # normal detached
    for k in g_j:
        a, b = np.asarray(g_j[k]), np.asarray(g_r[k])
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-5, err_msg=k)


def test_plane_stream_matches_remat():
    """Streamed-idx replay recomputes the plane's virtual winner from the
    recorded PLANE_IDX code — loss bit-identical to chunked remat."""
    scene, cam, cfg, key = _plane_setup(width=32, height=16, spp=6, depth=5,
                                        spp_chunk=2)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_s, g_s = _grads(scene, cam, _regen(cfg), key, target)
    l_c, g_c = _grads(
        scene, cam, _regen(cfg).replace(grad_regen_stream=False), key, target
    )
    assert float(l_s) == float(l_c), (float(l_s), float(l_c))
    for k in g_s:
        a, b = np.asarray(g_c[k]), np.asarray(g_s[k])
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7, err_msg=k)


def test_plane_albedo_fit_recovers_offset_grad_exact():
    """BASELINE config-4 extension: the plane is a differentiable leaf
    through the regen kernels.  Albedo RECOVERS by fit here (softness 0 —
    the mask freezes the offset, and an albedo-only objective needs no
    visibility gradients; the round-5 stochastic-transparency estimator
    would only add silhouette-coin noise at this 8-spp toy scale).
    Offset-fit CONVERGENCE is asserted in the on-chip suite
    (tests/test_tpu_smoke.py::test_plane_offset_fit_converges_on_chip at
    320x160@256spp) rather than at this file's toy scale, where the
    MC-noise floor's own k-dependence dominates."""
    scene, cam, cfg, key = _plane_setup(width=48, height=24, spp=8, depth=3)
    target = inverse.render_linear(
        scene, cam, _regen(cfg), jax.random.fold_in(key, 9)
    )
    truth = jnp.asarray(scene.plane)
    perturbed = scene.replace(
        plane=truth.at[4:].add(jnp.asarray([-0.2, 0.15, -0.1]))
    )
    mask = {"plane": jnp.zeros((7,), jnp.float32).at[4:].set(1.0)}
    recovered, losses = inverse.fit(
        perturbed, target, cam, _regen(cfg), key, steps=30, lr=3e-2,
        leaves=("plane",), param_mask=mask, softness=0.0,
    )
    err0 = float(jnp.abs(jnp.asarray(perturbed.plane)[4:] - truth[4:]).max())
    err1 = float(jnp.abs(jnp.asarray(recovered.plane)[4:] - truth[4:]).max())
    assert err1 < err0 * 0.5, (err0, err1, losses[::8])
    # Normal and offset must not have moved (masked).
    np.testing.assert_array_equal(
        np.asarray(recovered.plane)[:4], np.asarray(truth)[:4]
    )


def test_plane_offset_gradient_nonzero_and_matches_jnp():
    """The offset's (hit-side) visibility gradient under the all-bounce
    soft blend: nonzero, finite, and identical between the jnp bounce and
    the regen kernels."""
    scene, cam, cfg, key = _plane_setup(width=32, height=16, spp=8, depth=4)
    soft_cfg = cfg.replace(silhouette_softness=0.15)
    target = jnp.full((cfg.height, cfg.width, 3), 0.3, jnp.float32)
    params, ss = inverse.split_params(scene, ("plane",))

    def grad_k(c):
        _, g = jax.value_and_grad(inverse.pixel_loss)(
            params, ss, target, cam, c, key, ("plane",)
        )
        return float(g["plane"][3])

    gk_j = grad_k(soft_cfg)
    gk_r = grad_k(_regen(soft_cfg))
    assert np.isfinite(gk_j) and gk_j != 0.0, gk_j
    # rtol: the round-5 crossing coin adds a second knife-edge compare
    # (t_s - t_p vs the coin threshold) where the jnp matmul-form and the
    # kernels' elementwise discriminants can flip a borderline lane; at
    # this 8-spp scale one flip moves this scalar a few percent (measured
    # sign-varying across keys — sporadic, not systematic).
    np.testing.assert_allclose(gk_r, gk_j, rtol=6e-2, atol=1e-9)


def test_stream_plane_soft_rr_combined():
    """Everything at once: ground plane + soft silhouettes + Russian
    roulette + spp chunking (streamed-idx).  The features interact in the
    kernels (plane lanes excluded from the blend, RR after the blend, the
    plane's PLANE_IDX through the 10-bit pack), so the combination gets
    its own equivalence pin: loss bit-identical stream vs remat, and both
    match the jnp bounce to knife-edge tolerance."""
    scene, cam, cfg, key = _plane_setup(width=32, height=16, spp=6, depth=5,
                                        spp_chunk=2, rr_start_depth=2,
                                        silhouette_softness=0.05)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_s, g_s = _grads(scene, cam, _regen(cfg), key, target)
    l_c, g_c = _grads(
        scene, cam, _regen(cfg).replace(grad_regen_stream=False), key, target
    )
    assert float(l_s) == float(l_c), (float(l_s), float(l_c))
    for k in g_s:
        a, b = np.asarray(g_c[k]), np.asarray(g_s[k])
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-7, err_msg=k)
    l_j, g_j = _grads(scene, cam, cfg, key, target)
    # jnp vs kernels: the stochastic-transparency scheme (round 5) makes a
    # borderline acceptance coin a DISCONTINUOUS knife edge — the jnp
    # matmul-form discriminant vs the kernels' elementwise form can flip
    # one, jumping that sample's radiance.  Aggregate bounds, like the
    # hard-scan winner-flip tests (CLAUDE.md round 3).
    np.testing.assert_allclose(float(l_j), float(l_s), rtol=2e-3)
    for k in g_j:
        a, b = np.asarray(g_j[k]), np.asarray(g_s[k])
        err = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12)
        assert err < 0.05 or np.linalg.norm(b - a) < 1e-4, (
            f"leaf {k}: relative L2 grad error {err}"
        )


def test_regen_gradients_random_scene():
    """The reference's GenerateSpheres lattice scene (mixed materials,
    jittered geometry) through the regen kernels — the non-curated scene
    class had no gradient-equivalence pin."""
    from simplepathtracer_tpu.scenes import compact_scene, random_scene

    scene = compact_scene(random_scene(jax.random.PRNGKey(4), max_spheres=64))
    cam = spt.make_camera(origin=(0, 4, -10), lookat=(0, 2, 5), vfov_deg=60)
    cfg = spt.RenderConfig(width=24, height=12, spp=4, max_depth=4)
    key = jax.random.PRNGKey(6)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_j, g_j = _grads(scene, cam, cfg, key, target)
    l_r, g_r = _grads(scene, cam, _regen(cfg), key, target)
    # The r=1e4 ground sphere makes grazing discriminants cancel
    # catastrophically in f32, so jnp-vs-kernel fp orderings flip a few
    # knife-edge winners at this tiny shape — aggregate bounds (CLAUDE.md
    # round 3; stream-vs-remat comparisons stay exact elsewhere).
    np.testing.assert_allclose(float(l_j), float(l_r), rtol=2e-2)
    for k in g_j:
        a, b = np.asarray(g_j[k]), np.asarray(g_r[k])
        err = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12)
        # Near-zero leaves (fuzz norm ~8e-5 here) are dominated by a single
        # flipped metal chain — bound them absolutely instead.
        assert err < 0.1 or np.linalg.norm(b - a) < 1e-4, (
            f"leaf {k}: relative L2 grad error {err}"
        )
    # The strong pin: the two KERNEL implementations agree tightly on this
    # scene (measured |diff| ~1e-10; the jnp deltas above are knife-edge
    # winner flips between fp orderings, both kernels on the same side).
    l_p, g_p = _grads(
        scene, cam, cfg.replace(use_pallas_grad=True, pallas_interpret=True),
        key, target,
    )
    np.testing.assert_allclose(float(l_p), float(l_r), rtol=1e-6)
    for k in g_p:
        a, b = np.asarray(g_p[k]), np.asarray(g_r[k])
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-8, err_msg=k)


def test_regen_gradients_reference_scene():
    """The reference's own InitSpheres grid (S=10, the small-scan regime)
    through the regen kernels."""
    scene = spt.reference_scene()
    cam = spt.make_camera(origin=(0, 1, -3), lookat=(0, 1, 0), vfov_deg=90)
    cfg = spt.RenderConfig(width=24, height=12, spp=4, max_depth=4)
    key = jax.random.PRNGKey(8)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_j, g_j = _grads(scene, cam, cfg, key, target)
    l_r, g_r = _grads(scene, cam, _regen(cfg), key, target)
    np.testing.assert_allclose(float(l_j), float(l_r), rtol=1e-5)
    for k in g_j:
        a, b = np.asarray(g_j[k]), np.asarray(g_r[k])
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-5, err_msg=k)
