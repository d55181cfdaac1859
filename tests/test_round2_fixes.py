"""Regression tests for the round-2 correctness fixes (VERDICT.md items
3-4, ADVICE.md items): gradient entry points must accept forward-only
Pallas presets, checkpoints must round-trip the full config, the bounce
megakernel must honor Russian roulette, and the RNG slot-map depth limit
must be enforced.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import checkpoint, inverse
from simplepathtracer_tpu.parallel import make_mesh, train_step_sharded
from simplepathtracer_tpu.render import grad_safe_config


def _pallas_preset_cfg(**kw):
    """A preset-like config: forward fast path enabled (interpret on CPU)."""
    return spt.RenderConfig(use_pallas=True, pallas_interpret=True, **kw)


def test_grad_safe_config_downgrades_pallas():
    cfg = _pallas_preset_cfg(width=16, height=8, spp=2, max_depth=3)
    safe = grad_safe_config(cfg)
    assert not safe.use_pallas
    assert safe.use_pallas_hits  # interpret mode => hits kernel usable
    # No-op for already-differentiable configs.
    cfg2 = spt.RenderConfig(width=16, height=8)
    assert grad_safe_config(cfg2) is cfg2


def test_train_step_sharded_accepts_pallas_preset():
    """VERDICT weak #2: train_step_sharded(..., use_pallas=True) used to
    raise deep inside shard_map."""
    scene = spt.three_sphere_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60.0)
    cfg = _pallas_preset_cfg(width=16, height=8, spp=4, max_depth=3)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh(tiles=2, samples=2, devices=jax.devices()[:4])
    target = jnp.full((cfg.height, cfg.width, 3), 0.3, jnp.float32)
    new_scene, loss = train_step_sharded(scene, target, cam, cfg, key, mesh)
    assert np.isfinite(float(loss))
    # Gradients actually flowed (albedo moved).
    assert not np.allclose(np.asarray(new_scene.albedo), np.asarray(scene.albedo))


def test_inverse_fit_accepts_pallas_preset():
    """ADVICE medium: inverse.fit crashed for any use_pallas=True config."""
    scene = spt.three_sphere_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60.0)
    cfg = _pallas_preset_cfg(width=12, height=8, spp=2, max_depth=3)
    key = jax.random.PRNGKey(1)
    target = inverse.render_linear(scene, cam, grad_safe_config(cfg), key)
    fitted, losses = inverse.fit(
        scene, target, cam, cfg, key, steps=2, lr=1e-2, leaves=("albedo",)
    )
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)


def test_checkpoint_roundtrips_full_config(tmp_path):
    """ADVICE low: rr_start_depth / use_pallas_hits / silhouette_softness
    were silently dropped by snapshots."""
    cfg = spt.RenderConfig(
        width=16, height=8, spp=4, max_depth=4, rr_start_depth=2,
        use_pallas_hits=True, pallas_interpret=True, silhouette_softness=0.02,
    )
    scene = spt.simple_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1))
    key = jax.random.PRNGKey(5)
    s = spt.accumulate(spt.init_state(cfg, key), scene, cam, cfg, 2)
    p = str(tmp_path / "snap.npz")
    checkpoint.save(p, s, scene, cfg, cam)
    _, _, cfg_l, _ = checkpoint.load(p)
    assert cfg_l == cfg  # every field, not a hand-picked subset


def test_checkpoint_resume_bit_identical_with_rr(tmp_path):
    """Bit-identical resume for the RR config the bench headlines."""
    cfg = spt.RenderConfig(width=16, height=8, spp=8, max_depth=6, rr_start_depth=2)
    scene = spt.three_sphere_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1))
    key = jax.random.PRNGKey(9)
    full = spt.accumulate(spt.init_state(cfg, key), scene, cam, cfg, 3)
    full = spt.accumulate(full, scene, cam, cfg, 5)
    half = spt.accumulate(spt.init_state(cfg, key), scene, cam, cfg, 3)
    p = str(tmp_path / "rr.npz")
    checkpoint.save(p, half, scene, cfg, cam)
    s_l, scene_l, cfg_l, cam_l = checkpoint.load(p)
    assert cfg_l.rr_start_depth == 2
    resumed = spt.accumulate(s_l, scene_l, cam_l, cfg_l, 5)
    np.testing.assert_array_equal(np.asarray(resumed.accum), np.asarray(full.accum))


def test_max_depth_slot_map_limit():
    """ADVICE low: depth > 30 would silently reuse the camera RNG slots."""
    with pytest.raises(ValueError, match="slot"):
        spt.RenderConfig(max_depth=31)
    spt.RenderConfig(max_depth=30)  # boundary ok


def test_bounce_megakernel_russian_roulette_matches_jnp():
    """ADVICE low: trace_rays_pallas silently ignored rr_start_depth."""
    from simplepathtracer_tpu.ops.sampling import ray_keys
    from simplepathtracer_tpu.render import trace_rays, trace_rays_pallas

    scene = spt.three_sphere_scene()
    cfg = spt.RenderConfig(
        width=8, height=8, spp=1, max_depth=8, rr_start_depth=2,
        pallas_interpret=True,
    )
    key = jax.random.PRNGKey(13)
    n = 512
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    d = jax.random.normal(jax.random.PRNGKey(4), (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ctx = ray_keys(key, jnp.arange(n), jnp.zeros(n, jnp.int32))
    a = np.asarray(trace_rays(o, d, ctx, scene, cfg))
    b = np.asarray(trace_rays_pallas(o, d, ctx, scene, cfg))
    diff = np.abs(a - b)
    assert diff.mean() < 1e-4, diff.mean()
    assert (diff > 1e-3).mean() < 5e-3


def test_grad_safe_config_bounds_residual_memory():
    """Preset-scale spp must be auto-chunked under autodiff: the gradient
    backward keeps per-(ray, bounce) residuals alive, so an unchunked
    inverse.fit(PRESETS['cover'].config) (spp=100) would OOM.  The budget
    is path-dependent: regen residuals are per lane-iteration (136 B), the
    per-bounce fused path's per ray (~840 B at depth 10)."""
    from simplepathtracer_tpu.render import (
        _GRAD_ITER_BUDGET_REGEN, _GRAD_RAY_BUDGET, grad_safe_config,
    )

    cfg = spt.RenderConfig(
        width=1200, height=800, spp=100, max_depth=10, spp_chunk=0,
        use_pallas=True,
    )
    safe = grad_safe_config(cfg)
    assert safe.spp_chunk > 0
    if safe.grad_regen:
        assert (safe.spp_chunk * cfg.num_pixels * cfg.max_depth
                <= _GRAD_ITER_BUDGET_REGEN)
    else:
        assert safe.spp_chunk * cfg.num_pixels <= _GRAD_RAY_BUDGET
    # An explicitly non-regen config keeps the tighter per-ray budget.
    safe_pb = grad_safe_config(cfg.replace(use_pallas=False,
                                           use_pallas_grad=True))
    assert safe_pb.spp_chunk * cfg.num_pixels <= _GRAD_RAY_BUDGET
    # Small configs stay unchunked (no needless scan in the trace).
    small = spt.RenderConfig(width=48, height=24, spp=2)
    assert grad_safe_config(small).spp_chunk == 0
    # An explicit user chunk is respected.
    explicit = grad_safe_config(cfg.replace(spp_chunk=5))
    assert explicit.spp_chunk == 5


def test_chunked_gradients_match_unchunked():
    """spp-chunked (rematerialized) gradients == one-batch gradients."""
    from simplepathtracer_tpu import inverse

    scene = spt.three_sphere_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60)
    key = jax.random.PRNGKey(5)
    target = jnp.zeros((16, 32, 3), jnp.float32)
    params, static_scene = inverse.split_params(scene)

    def grads(chunk):
        cfg = spt.RenderConfig(
            width=32, height=16, spp=4, max_depth=5, spp_chunk=chunk
        )
        _, g = jax.value_and_grad(inverse.pixel_loss)(
            params, static_scene, target, cam, cfg, key
        )
        return g

    g0 = grads(0)
    g1 = grads(1)
    for k in g0:
        np.testing.assert_allclose(
            np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-5, atol=1e-7
        )
