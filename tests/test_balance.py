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
