"""Adaptive lane balancing (probe + cost-sorted snake assignment).

The persistent kernel runs each 1024-lane block as long as its most loaded
lane; ``accumulate`` with ``balance_probe_spp`` measures per-pixel cost in a
probe pass and re-assigns pixels to lanes in cost-balanced order for the
remaining spp.  Lane placement must not change any pixel value — all
randomness is keyed by global (pixel, sample) ids — so the balanced image
must be BIT-identical to the equivalent unbalanced two-chunk schedule.
"""

import jax
import jax.numpy as jnp
import numpy as np

import simplepathtracer_tpu as spt
from simplepathtracer_tpu.render import _balanced_perm, accumulate, init_state


def test_balanced_perm_is_permutation():
    # Non-divisible sizes exercise the partial-final-bank identity path.
    for p in (1024 * 16, 1024 * 16 + 777, 5000, 130):
        counts = jax.random.uniform(jax.random.PRNGKey(p), (p,)) * 100
        perm = np.asarray(_balanced_perm(counts))
        assert sorted(perm.tolist()) == list(range(p)), p


def test_balanced_accumulate_bit_identical():
    scene = spt.reference_scene()
    cam = spt.make_camera(origin=(0, 1, -3), lookat=(0, 1, 0), vfov_deg=90)
    base = dict(
        width=40, height=26, spp=8, max_depth=6,
        use_pallas=True, pallas_interpret=True,
    )
    key = jax.random.PRNGKey(5)

    cfg_bal = spt.RenderConfig(**base, balance_probe_spp=2)
    st = accumulate(init_state(cfg_bal, key), scene, cam, cfg_bal, 8)

    # The unbalanced schedule with the same chunk split (2 + 6): identical
    # fp association, image order lanes.
    cfg = spt.RenderConfig(**base)
    st2 = accumulate(init_state(cfg, key), scene, cam, cfg, 2)
    st2 = accumulate(st2, scene, cam, cfg, 6)

    np.testing.assert_array_equal(np.asarray(st.accum), np.asarray(st2.accum))
    assert int(st.sample_count) == 8


def test_iteration_counts_sane():
    """The probe's per-pixel iteration counts: >= spp (every sample costs at
    least one iteration) and <= spp * max_depth."""
    from simplepathtracer_tpu.render import _render_block_pallas

    scene = spt.reference_scene()
    cam = spt.make_camera(origin=(0, 1, -3), lookat=(0, 1, 0), vfov_deg=90)
    cfg = spt.RenderConfig(
        width=40, height=26, spp=4, max_depth=6,
        use_pallas=True, pallas_interpret=True,
    )
    pix = jnp.arange(cfg.num_pixels, dtype=jnp.int32)
    _, counts = _render_block_pallas(
        scene, cam, cfg, jax.random.PRNGKey(0), pix, 0, 4, return_counts=True
    )
    c = np.asarray(counts)
    assert c.shape == (cfg.num_pixels,)
    assert (c >= 4).all(), c.min()
    assert (c <= 4 * cfg.max_depth).all(), c.max()


def test_fit_rebalance_matches_unbalanced():
    """Round-4: balance=True re-probes the CURRENT scene every
    rebalance_every steps.  The re-probed permutation changes lane
    placement only — the fit trajectory must still match the unbalanced
    one (same keys, same sample set, fp-tolerance losses)."""
    from simplepathtracer_tpu import inverse

    scene = spt.three_sphere_scene(hollow_glass=False)
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60)
    cfg = spt.RenderConfig(width=32, height=16, spp=2, max_depth=4,
                           use_pallas_grad=True, grad_regen=True,
                           pallas_interpret=True)
    key = jax.random.PRNGKey(2)
    target = inverse.render_linear(scene, cam, cfg, jax.random.fold_in(key, 9))
    perturbed = scene.replace(albedo=jnp.clip(scene.albedo + 0.2, 0.05, 0.95))
    _, losses_u = inverse.fit(
        perturbed, target, cam, cfg, key, steps=5, lr=3e-2, leaves=("albedo",)
    )
    _, losses_b = inverse.fit(
        perturbed, target, cam, cfg, key, steps=5, lr=3e-2, leaves=("albedo",),
        balance=True, rebalance_every=2,
    )
    np.testing.assert_allclose(losses_b, losses_u, rtol=1e-4)
