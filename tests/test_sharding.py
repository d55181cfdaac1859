"""Sharded render/grad equivalence on the fake 8-device CPU mesh.

SURVEY.md S4 item 4: the distributed guarantee of this framework is that the
mesh shape is *unobservable* — same key => bit-identical image for any
(tiles, samples) factorization, and sharded gradients match single-device
gradients.  The reference has no analog (its threads race on a shared
framebuffer; scheduling changes the RNG streams).
"""

import jax
import jax.numpy as jnp
import pytest

import importlib

R = importlib.import_module("simplepathtracer_tpu.render")
from simplepathtracer_tpu import scenes
from simplepathtracer_tpu.parallel import (
    loss_and_grad_sharded,
    make_mesh,
    render_sharded,
    split_scene,
    train_step_sharded,
)
from simplepathtracer_tpu.types import RenderConfig, make_camera

CFG = RenderConfig(width=32, height=16, spp=8, max_depth=4)


def _setup():
    scene = scenes.three_sphere_scene()
    camera = make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60.0)
    key = jax.random.PRNGKey(7)
    return scene, camera, key


def _single_device_image(scene, camera, key):
    return R.render(scene, camera, CFG, key)


@pytest.mark.parametrize("tiles,samples", [(8, 1), (4, 2), (2, 4), (1, 8), (1, 1)])
def test_sharded_render_matches_single_device(tiles, samples):
    scene, camera, key = _setup()
    expected = _single_device_image(scene, camera, key)
    mesh = make_mesh(tiles=tiles, samples=samples, devices=jax.devices()[: tiles * samples])
    got = render_sharded(scene, camera, CFG, key, mesh)
    assert jnp.allclose(got, expected, atol=1e-5), (
        f"mesh {tiles}x{samples} changed the image (max err "
        f"{jnp.max(jnp.abs(got - expected))})"
    )


def test_sharded_grad_matches_single_device():
    scene, camera, key = _setup()
    target = jnp.zeros((CFG.height, CFG.width, 3), jnp.float32) + 0.25

    # single-device reference loss/grad using the same (pixel, sample) keys
    params, rest = split_scene(scene)

    def loss_single(params):
        sc = rest.replace(**params)
        acc = R.render_sample_batch(sc, camera, CFG, key, 0, CFG.spp)
        mean = acc / CFG.spp
        return jnp.sum((mean - target.reshape(-1, 3)) ** 2) / (CFG.num_pixels * 3)

    l_ref, g_ref = jax.value_and_grad(loss_single)(params)

    mesh = make_mesh(tiles=2, samples=4)
    l_sh, g_sh = loss_and_grad_sharded(scene, target, camera, CFG, key, mesh)
    assert jnp.allclose(l_sh, l_ref, rtol=1e-5), (l_sh, l_ref)
    for k in g_ref:
        assert jnp.allclose(g_sh[k], g_ref[k], rtol=1e-4, atol=1e-6), (
            f"grad mismatch for {k}: {jnp.max(jnp.abs(g_sh[k] - g_ref[k]))}"
        )


def test_train_step_decreases_loss():
    scene, camera, key = _setup()
    # target = render of a perturbed scene; one SGD step should reduce MSE
    target_scene = scene.replace(albedo=jnp.clip(scene.albedo + 0.2, 0, 1))
    mesh = make_mesh(tiles=4, samples=2)
    cfg = CFG
    acc = R.render_sample_batch(target_scene, camera, cfg, key, 0, cfg.spp)
    target = (acc / cfg.spp).reshape(cfg.height, cfg.width, 3)

    s1, l1 = train_step_sharded(scene, target, camera, cfg, key, mesh, lr=0.5)
    s2, l2 = train_step_sharded(s1, target, camera, cfg, key, mesh, lr=0.5)
    assert float(l2) < float(l1), (l1, l2)


def test_mesh_validation():
    with pytest.raises(AssertionError):
        make_mesh(tiles=3, samples=3)  # 9 != 8 devices


def test_sharded_pallas_render_matches_jnp():
    """The persistent Pallas kernel under shard_map (interpret mode) must
    agree with the single-device jnp reference path."""
    scene, camera, key = _setup()
    cfg = CFG.replace(use_pallas=True, pallas_interpret=True)
    mesh = make_mesh(tiles=2, samples=4)
    a = render_sharded(scene, camera, cfg, key, mesh)
    b = R.render(scene, camera, CFG, key)
    assert jnp.abs(a - b).max() < 1e-4, float(jnp.abs(a - b).max())
