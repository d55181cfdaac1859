"""Opaque-opaque intersection-edge (t-crossing) estimator — round 5.

The stochastic plane-vs-sphere WINNER SELECT (sphere beats the plane iff
t_s < t_p + logit(ux) * sigma_x, coin slot 128 + b) runs in the jnp bounce
and the regen kernels; the realized outcome's probability rides the
detached REINFORCE ratio.  Scenes here have spheres POKING THROUGH the
ground plane so the crossing band is actually exercised (the pre-existing
plane tests keep their spheres clear of it).

The companion VALIDITY coin (same eval, word 1) softens the t > t_min
candidate gate whose far-root flips at phantom-continuation origins
carried the other major share of the edge mass; the chain's previous
winner keeps the hard gate (its own far root sits at exactly 0 — a coin
there re-validates bounces as in-place self-hits).

Validated here: jnp/kernel forward + gradient equivalence, stream-vs-remat
bit-identity, and the estimator's sign fix (the buried sphere's radius
gradient measured AD/FD = -0.49 WRONG-SIGNED one-sided; with both coins
it is positive and O(1) — experiments/r5_crossing_fd.py and BASELINE.md
late-round-5 section have the full study; the remaining unowned class is
the near/far-root SELECT jump).
"""

import jax
import jax.numpy as jnp
import numpy as np

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import inverse, scenes
from simplepathtracer_tpu.types import Material


def _poke_scene():
    sc = scenes._scene_from_lists(
        [[0.0, -0.5, 1.0], [0.9, -0.35, 1.3], [-0.85, -0.62, 0.9]],
        [0.4, 0.3, 0.35],
        [[0.1, 0.2, 0.5], [0.8, 0.6, 0.2], [0.7, 0.15, 0.15]],
        [Material.LAMBERTIAN, Material.LAMBERTIAN, Material.LAMBERTIAN],
        [0.0, 0.0, 0.0], [1.5, 1.5, 1.5],
        scenes.SHIRLEY_SKY_LO, scenes.SHIRLEY_SKY_HI,
    )
    return scenes.with_ground_plane(sc)


def _setup(width=32, height=16, spp=4, depth=4, **cfg_kw):
    scene = _poke_scene()
    cam = spt.make_camera(origin=(0.0, 0.5, -1.2), lookat=(0.0, -0.35, 1.0),
                          vfov_deg=55)
    cfg = spt.RenderConfig(width=width, height=height, spp=spp,
                           max_depth=depth, silhouette_softness=0.05,
                           **cfg_kw)
    return scene, cam, cfg, jax.random.PRNGKey(7)


def _regen(cfg):
    return cfg.replace(use_pallas_grad=True, grad_regen=True,
                       pallas_interpret=True)


def _grads(scene, cam, cfg, key, target):
    params, static_scene = inverse.split_params(scene)
    return jax.value_and_grad(inverse.pixel_loss)(
        params, static_scene, target, cam, cfg, key
    )


def test_crossing_forward_matches_jnp():
    """Stochastic winner select: the same coins flip the same lanes in the
    jnp bounce and the regen kernels (shared slot map, shared compare)."""
    scene, cam, cfg, key = _setup()
    img_j = inverse.render_linear(scene, cam, cfg, key)
    img_r = inverse.render_linear(scene, cam, _regen(cfg), key)
    d = np.abs(np.asarray(img_j) - np.asarray(img_r))
    assert d.mean() < 2e-6 and d.max() < 1e-3, (d.mean(), d.max())


def test_crossing_gradients_match_jnp():
    """Gradients across the crossing band: jnp vs regen kernels.  Borderline
    coins are knife edges (matmul-form vs elementwise discriminants), so
    aggregate rel-L2 bounds like the other stochastic-scheme pins."""
    scene, cam, cfg, key = _setup(depth=4)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_j, g_j = _grads(scene, cam, cfg, key, target)
    l_r, g_r = _grads(scene, cam, _regen(cfg), key, target)
    np.testing.assert_allclose(float(l_j), float(l_r), rtol=2e-3)
    for k in g_j:
        a, b = np.asarray(g_j[k]), np.asarray(g_r[k])
        err = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12)
        assert err < 0.05 or np.linalg.norm(b - a) < 1e-4, (
            f"leaf {k}: relative L2 grad error {err}"
        )


def test_crossing_stream_matches_remat():
    """Streamed-idx replay consumes the RECORDED winner/blocker (incl. the
    crossing loser stashed in the blocker slot) — loss bit-identical."""
    scene, cam, cfg, key = _setup(spp=6, depth=5, spp_chunk=2,
                                  rr_start_depth=2)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    l_s, g_s = _grads(scene, cam, _regen(cfg), key, target)
    l_c, g_c = _grads(
        scene, cam, _regen(cfg).replace(grad_regen_stream=False), key, target
    )
    assert float(l_s) == float(l_c), (float(l_s), float(l_c))
    for k in g_s:
        a, b = np.asarray(g_c[k]), np.asarray(g_s[k])
        # atol: the crossing factor's plane-offset partial (ct_pk) is
        # accumulated on different schedules by the two pipelines — ~5e-7
        # fp jitter on O(1e-2) gradients; the loss stays bit-identical.
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6, err_msg=k)


def test_validity_coin_no_self_hits_no_nan():
    """Regression: a validity band centered at t_min would re-validate the
    chain's own sphere (far root exactly 0) on ~45% of bounces — in-place
    self-hit loops that surfaced as rare-sample NaNs at depth 3.  The
    previous-winner hard gate must keep deep soft renders finite and
    energy-sane."""
    scene, cam, cfg, key = _setup(width=48, height=24, spp=1024, depth=4)
    img = np.asarray(inverse.render_linear(scene, cam, cfg, key))
    assert np.isfinite(img).all()
    # Self-hit loops eat throughput: the mean must stay near the hard
    # render's (soft smoothing alone moves it well under 5%).
    hard = np.asarray(inverse.render_linear(
        scene, cam, cfg.replace(silhouette_softness=0.0, spp=256), key
    ))
    assert abs(img.mean() - hard.mean()) < 0.05 * hard.mean(), (
        img.mean(), hard.mean()
    )


def test_crossing_fixes_buried_radius_gradient_sign():
    """The headline estimator check: d loss / d radius of the half-buried
    sphere.  One-sided round 4 measured AD/FD = -0.49 (WRONG-SIGNED: the
    intersection-circle edge mass was invisible); with the crossing +
    validity coins the jnp AD must carry the same sign as CRN finite
    differences and an O(1) fraction of their magnitude (~0.44 at this
    depth-3 MSE config at high spp; the crossing-zoom scene reads
    0.86-0.89 — the remaining unowned class is the near/far-root select
    jump, BASELINE.md late round 5)."""
    scene, cam, cfg, key = _setup(width=48, height=24, spp=512, depth=3)
    prng = np.random.default_rng(11)
    pert = scene.replace(
        centers=scene.centers + jnp.asarray(
            0.04 * prng.standard_normal(scene.centers.shape), jnp.float32),
        radii=scene.radii * jnp.asarray(
            1.0 + 0.05 * prng.standard_normal(scene.radii.shape), jnp.float32),
    )
    target = inverse.render_linear(pert, cam, cfg, jax.random.PRNGKey(99))
    params, static_scene = inverse.split_params(scene)

    @jax.jit
    def loss_fn(p):
        return inverse.pixel_loss(p, static_scene, target, cam, cfg, key)

    g = jax.grad(loss_fn)(params)
    v = jnp.zeros(3).at[0].set(1.0)  # buried sphere's radius
    ad = float(jnp.vdot(g["radii"], v))
    eps = 4e-3

    def at(t):
        p = dict(params)
        p["radii"] = params["radii"] + t * v
        return float(loss_fn(p))

    fd = (at(eps) - at(-eps)) / (2 * eps)
    assert fd != 0.0
    ratio = ad / fd
    assert 0.3 < ratio < 1.8, (ad, fd, ratio)
