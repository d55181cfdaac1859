"""Snapshot/resume determinism (SURVEY.md S5 checkpoint row)."""

import os

import jax
import numpy as np

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
