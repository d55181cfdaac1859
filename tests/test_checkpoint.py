"""Snapshot/resume determinism (SURVEY.md S5 checkpoint row)."""

import os

import jax
import numpy as np
import pytest

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import checkpoint


def test_roundtrip_and_bit_identical_resume(tmp_path):
    scene = spt.three_sphere_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1))
    cfg = spt.RenderConfig(width=32, height=16, spp=8, max_depth=4)
    key = jax.random.PRNGKey(3)

    # Same chunk structure without interruption: 3 then 5 spp in-process.
    s_full = spt.accumulate(spt.init_state(cfg, key), scene, cam, cfg, 3)
    s_full = spt.accumulate(s_full, scene, cam, cfg, 5)

    # Interrupted: 3 spp, snapshot, "crash", load, continue 5 spp.
    s_half = spt.accumulate(spt.init_state(cfg, key), scene, cam, cfg, 3)
    p = str(tmp_path / "snap.npz")
    checkpoint.save(p, s_half, scene, cfg, cam)
    assert os.path.exists(p)

    s_loaded, scene_l, cfg_l, cam_l = checkpoint.load(p)
    assert cfg_l == cfg
    np.testing.assert_array_equal(np.asarray(cam_l.origin), np.asarray(cam.origin))
    np.testing.assert_array_equal(np.asarray(s_loaded.accum), np.asarray(s_half.accum))
    np.testing.assert_array_equal(
        np.asarray(scene_l.centers), np.asarray(scene.centers)
    )

    # The snapshot round-trip must not change a single bit of the result.
    s_resumed = spt.accumulate(s_loaded, scene_l, cam, cfg_l, 5)
    np.testing.assert_array_equal(
        np.asarray(s_resumed.accum), np.asarray(s_full.accum)
    )
    assert int(s_resumed.sample_count) == 8

    # And against a one-shot 8-spp run the result agrees to fp tolerance
    # (summation order differs; the samples are identical).
    s_oneshot = spt.accumulate(spt.init_state(cfg, key), scene, cam, cfg, 8)
    np.testing.assert_allclose(
        np.asarray(s_resumed.accum), np.asarray(s_oneshot.accum), rtol=1e-5, atol=1e-5
    )


def test_atomic_overwrite(tmp_path):
    scene = spt.simple_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1))
    cfg = spt.RenderConfig(width=8, height=8, spp=2, max_depth=2)
    s = spt.accumulate(spt.init_state(cfg, jax.random.PRNGKey(0)), scene, cam, cfg, 2)
    p = str(tmp_path / "snap.npz")
    checkpoint.save(p, s, scene, cfg)
    checkpoint.save(p, s, scene, cfg)  # overwrite in place must not corrupt
    s2, _, _, cam2 = checkpoint.load(p)
    assert cam2 is None  # saved without a camera
    np.testing.assert_array_equal(np.asarray(s.accum), np.asarray(s2.accum))


def test_sharded_checkpoint_roundtrip(tmp_path):
    """Sharded snapshot/restore on the 8-device mesh: save after 4 spp,
    restore, continue 4 more — bit-identical to an uninterrupted 8-spp
    sharded render (VERDICT r2 missing #4)."""
    from simplepathtracer_tpu.parallel import make_mesh, render_accum_sharded

    scene = spt.three_sphere_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60.0)
    cfg = spt.RenderConfig(width=32, height=16, spp=8, max_depth=4)
    key = jax.random.PRNGKey(3)
    mesh = make_mesh(tiles=4, samples=2)

    acc4 = jax.jit(
        lambda s, c, k: render_accum_sharded(s, c, cfg, k, mesh, 0, 4)
    )(scene, cam, key)
    prefix = str(tmp_path / "shard_snap")
    path = checkpoint.save_sharded(prefix, acc4, 4, key, scene, cfg, mesh, cam)
    assert path.endswith(".proc0of1.npz")

    acc_l, done, key_l, scene_l, cfg_l, cam_l = checkpoint.load_sharded(prefix, mesh)
    assert done == 4 and cfg_l == cfg
    np.testing.assert_array_equal(np.asarray(acc_l), np.asarray(acc4))
    assert cam_l is not None

    more = jax.jit(
        lambda s, c, k: render_accum_sharded(s, c, cfg_l, k, mesh, done, 4)
    )(scene_l, cam_l, key_l)
    resumed = np.asarray(acc_l + more)

    full = np.asarray(jax.jit(
        lambda s, c, k: render_accum_sharded(s, c, cfg, k, mesh, 0, 8)
    )(scene, cam, key))
    # Same samples, same per-pixel summation order (chunked identically).
    np.testing.assert_allclose(resumed, full, rtol=1e-6, atol=1e-6)


def test_sharded_checkpoint_mesh_mismatch(tmp_path):
    from simplepathtracer_tpu.parallel import make_mesh, render_accum_sharded

    scene = spt.simple_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1))
    cfg = spt.RenderConfig(width=16, height=8, spp=2, max_depth=2)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh(tiles=4, samples=2)
    acc = render_accum_sharded(scene, cam, cfg, key, mesh, 0, 2)
    prefix = str(tmp_path / "m")
    checkpoint.save_sharded(prefix, acc, 2, key, scene, cfg, mesh, cam)
    other = make_mesh(tiles=8, samples=1)
    with pytest.raises(ValueError, match="mesh"):
        checkpoint.load_sharded(prefix, other)
