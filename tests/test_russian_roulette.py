"""Russian roulette: unbiased early termination (config.rr_start_depth)."""

import jax
import numpy as np

import simplepathtracer_tpu as spt


def _render(cfg_kw, key, **extra):
    scene = spt.three_sphere_scene()
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60)
    cfg = spt.RenderConfig(**cfg_kw, **extra)
    return np.asarray(spt.render(scene, cam, cfg, key))


KW = dict(width=48, height=24, spp=64, max_depth=8)


def test_rr_unbiased_vs_full_depth():
    """At matched spp the RR estimator's mean must agree with the full-depth
    render within Monte-Carlo error (it terminates paths stochastically but
    reweights by 1/p)."""
    key = jax.random.PRNGKey(0)
    full = _render(KW, key)
    rr = _render(KW, jax.random.PRNGKey(1), rr_start_depth=3)
    d = np.abs(full - rr)
    assert d.mean() < 0.02, d.mean()


def test_rr_pallas_matches_jnp():
    key = jax.random.PRNGKey(2)
    kw = dict(width=32, height=16, spp=8, max_depth=6)
    a = _render(kw, key, rr_start_depth=2)
    b = _render(kw, key, rr_start_depth=2, use_pallas=True, pallas_interpret=True)
    d = np.abs(a - b)
    assert d.mean() < 1e-4 and (d > 1e-3).mean() < 5e-3, (d.mean(), d.max())
