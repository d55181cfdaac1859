"""Mosaic-compiled kernel correctness on real TPU hardware.

All pallas-vs-jnp equivalence tests run in *interpret* mode on the CI CPU
backend — but the Mosaic lowering is exactly where interpret mode can
diverge (the bitcast u32->f32 RNG conversion, the exp(log/3) cbrt, the
NaN-self-rejecting sphere scan: CLAUDE.md "Mosaic lowering gaps").  This
suite pins the COMPILED kernels against the jnp reference on a real chip;
it skips cleanly on CPU.  Run from a TPU-attached session:

    SPT_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q -p no:cacheprovider

(SPT_TPU_TESTS=1 tells tests/conftest.py not to force the CPU backend.)
"""

import jax
import numpy as np
import pytest

import simplepathtracer_tpu as spt

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="compiled-Mosaic smoke test requires real TPU hardware",
)


def test_persistent_kernel_matches_jnp_compiled():
    """64x32@4spp: persistent megakernel (compiled) vs jnp path."""
    scene = spt.three_sphere_scene(hollow_glass=True)
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60.0)
    key = jax.random.PRNGKey(11)
    kw = dict(width=64, height=32, spp=4, max_depth=6)
    a = np.asarray(spt.render(scene, cam, spt.RenderConfig(**kw), key))
    b = np.asarray(
        spt.render(scene, cam, spt.RenderConfig(**kw, use_pallas=True), key)
    )
    d = np.abs(a - b)
    assert d.mean() < 1e-4, f"mean diff {d.mean()}"
    assert (d > 1e-3).mean() < 5e-3, f"outlier fraction {(d > 1e-3).mean()}"


def test_closest_hit_kernel_matches_jnp_compiled():
    """Compiled closest-hit argmin (use_pallas_hits) == pure jnp argmin."""
    scene = spt.reference_scene()
    cam = spt.make_camera(origin=(0, 1, -3), lookat=(0, 1, 0), vfov_deg=90.0)
    key = jax.random.PRNGKey(3)
    kw = dict(width=48, height=48, spp=2, max_depth=6)
    a = np.asarray(spt.render(scene, cam, spt.RenderConfig(**kw), key))
    b = np.asarray(
        spt.render(scene, cam, spt.RenderConfig(**kw, use_pallas_hits=True), key)
    )
    d = np.abs(a - b)
    # Same math modulo the kernel's NaN-trick discriminant test; knife-edge
    # pixels may flip single samples, and at 48x48@2spp ONE flipped sample
    # moves the mean by ~2e-4 (measured 1.5e-4 on the real chip, with the
    # 99th percentile at fp-noise level) — so bound the mean loosely and
    # the typical error tightly.  Real Mosaic divergence is pervasive, not
    # two pixels.
    assert d.mean() < 1e-3, f"mean diff {d.mean()}"
    assert np.quantile(d, 0.99) < 1e-5, f"p99 diff {np.quantile(d, 0.99)}"
    assert (d > 1e-3).mean() < 5e-3, f"outlier fraction {(d > 1e-3).mean()}"


def test_fused_grad_kernels_match_jnp_compiled():
    """Compiled fused fwd+bwd (use_pallas_grad) vs jnp autodiff gradients.

    Small scene + low depth keeps knife-edge chaos out of the comparison
    (at production scale the divergence between ANY two fp orderings is
    dominated by grazing-hit sign flips; see BASELINE.md round-2 notes).
    """
    import jax.numpy as jnp

    from simplepathtracer_tpu import inverse

    scene = spt.three_sphere_scene(hollow_glass=True)
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60.0)
    cfg = spt.RenderConfig(width=64, height=32, spp=2, max_depth=5)
    fused = cfg.replace(use_pallas_grad=True)
    key = jax.random.PRNGKey(7)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    params, static_scene = inverse.split_params(scene)

    def grads(c):
        loss, g = jax.value_and_grad(inverse.pixel_loss)(
            params, static_scene, target, cam, c, key
        )
        return float(loss), {k: np.asarray(v) for k, v in g.items()}

    loss_ref, g_ref = grads(cfg)
    loss_fused, g_fused = grads(fused)
    assert abs(loss_fused - loss_ref) < 1e-5 + 1e-3 * abs(loss_ref)
    for k in g_ref:
        assert np.isfinite(g_fused[k]).all(), f"non-finite grad for {k}"
        err = np.linalg.norm(g_fused[k] - g_ref[k]) / (
            np.linalg.norm(g_ref[k]) + 1e-12
        )
        assert err < 2e-3, f"leaf {k}: relative L2 grad error {err}"


def test_regen_grad_kernels_match_jnp_compiled():
    """Compiled regeneration gradient kernels (ops/pallas_grad_regen.py) vs
    the jnp bounce: values + all 7 leaf gradients.  This is the Mosaic
    proof for the two features interpret mode cannot validate — dynamic
    leading-dim residual indexing (ref[k] with a traced k) and VMEM scratch
    persisting across the sequential chunk grid."""
    import jax.numpy as jnp

    from simplepathtracer_tpu import inverse

    scene = spt.three_sphere_scene(hollow_glass=False)
    cam = spt.make_camera(origin=(0, 0, -1), lookat=(0, 0, 1), vfov_deg=60.0)
    key = jax.random.PRNGKey(5)
    cfg = spt.RenderConfig(width=64, height=32, spp=4, max_depth=6)
    cfg_r = cfg.replace(use_pallas_grad=True, grad_regen=True)
    target = jnp.full((cfg.height, cfg.width, 3), 0.25, jnp.float32)
    params, static_scene = inverse.split_params(scene)

    def vg(c):
        return jax.value_and_grad(inverse.pixel_loss)(
            params, static_scene, target, cam, c, key
        )

    l_j, g_j = vg(cfg)
    l_r, g_r = vg(cfg_r)
    np.testing.assert_allclose(float(l_j), float(l_r), rtol=1e-5)
    for k in g_j:
        a, b = np.asarray(g_j[k]), np.asarray(g_r[k])
        if k in ("centers", "radii"):
            # Geometry leaves: Mosaic-compiled fp ordering flips
            # knife-edge winners at small scale (CLAUDE.md round 3);
            # a single grazing-hit flip moves O(1e-4) of gradient mass
            # between neighboring spheres.  Bound the aggregate, not
            # every element (interpret mode pins elementwise).
            err = np.linalg.norm(b - a) / (np.linalg.norm(a) + 1e-12)
            assert err < 6e-2, f"leaf {k}: relative L2 grad error {err}"
            assert np.abs(b - a).max() < 5e-4, f"leaf {k} max abs"
        else:
            np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-6,
                                       err_msg=k)


def test_mosaic_dynamic_leading_dim_and_scratch_grid():
    """Isolated probes for the two Mosaic features the regen gradient
    kernels depend on: (a) dynamic leading-dim ref[k] stores/loads inside
    a fori_loop, (b) VMEM scratch persisting across a sequential grid
    dimension.  Tiny kernel, compiles in seconds — if the big kernel fails
    to build, this pinpoints which mechanism Mosaic rejected."""
    import functools

    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    CH, NCH = 4, 3  # chunk rows per grid step, sequential steps

    def kernel(x_ref, out_ref, acc_ref):
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[:] = jnp.zeros((8, 128), jnp.float32)

        def body(kl, _):
            # Dynamic leading-dim store (traced kl) + scratch accumulation.
            acc_ref[:] = acc_ref[:] + x_ref[:]
            out_ref[kl] = acc_ref[:] * (kl + 1)
            return 0

        jax.lax.fori_loop(0, CH, body, 0)

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128) / 1024.0
    out = pl.pallas_call(
        kernel,
        grid=(1, NCH),
        in_specs=[pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((CH, 8, 128), lambda i, j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CH * NCH, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(x)
    out = np.asarray(out)
    # acc after global iteration g (0-based) is (g+1)*x; row g stores
    # acc * (local_k+1).
    for j in range(NCH):
        for kl in range(CH):
            g = j * CH + kl
            expected = (g + 1) * (kl + 1) * np.asarray(x)
            np.testing.assert_allclose(out[g], expected, rtol=1e-6,
                                       err_msg=f"chunk {j} row {kl}")


def test_plane_offset_fit_converges_on_chip():
    """Plane-OFFSET recovery (round 4): the one-sided soft blend's offset
    gradient is a same-sign ~half-magnitude estimator of the true edge
    derivative whose SNR needs production-scale sampling — small CPU fits
    wander on the MC-noise floor's own k-dependence, but at 320x160@256spp
    per step on chip the fit converges cleanly (measured 0.8 -> 0.508
    against truth 0.5 in 50 steps).  This is the on-chip half of the
    plane-gradient story; exactness vs jnp is pinned in
    tests/test_pallas_grad_regen.py."""
    import jax.numpy as jnp

    from simplepathtracer_tpu import inverse
    from simplepathtracer_tpu.types import Material

    def mk(k):
        return spt.Scene(
            centers=jnp.asarray([[0.0, 4.0, 2.0]], jnp.float32),
            radii=jnp.asarray([2.5], jnp.float32),
            albedo=jnp.asarray([[0.9, 0.4, 0.2]], jnp.float32),
            material=jnp.asarray([int(Material.LAMBERTIAN)], jnp.int32),
            fuzz=jnp.zeros((1,), jnp.float32),
            ior=jnp.ones((1,), jnp.float32),
            sky_lo=jnp.asarray([1.0, 1.0, 1.0], jnp.float32),
            sky_hi=jnp.asarray([0.2, 0.5, 1.0], jnp.float32),
            plane=jnp.asarray([0.0, 1.0, 0.0, k, 0.85, 0.85, 0.6],
                              jnp.float32),
        )

    scene = mk(0.5)
    cam = spt.make_camera(origin=(0, 1.0, 0), lookat=(0, 0.0, 2.0),
                          vfov_deg=50)
    soft = 0.15
    cfg = spt.RenderConfig(width=320, height=160, spp=256, max_depth=4,
                           use_pallas_grad=True, grad_regen=True)
    key = jax.random.PRNGKey(3)
    target = inverse.render_linear(
        scene, cam, cfg.replace(silhouette_softness=soft),
        jax.random.fold_in(key, 9),
    )
    pert = mk(0.8)
    mask = {"plane": jnp.zeros((7,), jnp.float32).at[3].set(1.0)}
    rec, _ = inverse.fit(
        pert, target, cam, cfg, key, steps=40, lr=8e-3, leaves=("plane",),
        softness=soft, param_mask=mask,
    )
    err0, err1 = 0.3, abs(float(rec.plane[3]) - 0.5)
    assert err1 < err0 * 0.25, f"offset fit did not converge: {err1:.4f}"


def test_buried_radius_fit_converges_on_chip():
    """Intersection-edge recovery (late round 5): a half-buried sphere's
    radius, whose loss signal lives at its intersection CIRCLE with the
    ground plane — the edge class the crossing + validity coins own (the
    one-sided estimator measured AD/FD = -0.49 there: wrong-signed, the
    fit would run AWAY from truth).  Measured on chip: 0.30 -> 0.3981
    against truth 0.40 in 80 steps at 256x128@128spp (54x error
    reduction); this asserts a 5x margin."""
    import jax.numpy as jnp

    from simplepathtracer_tpu import inverse, scenes
    from simplepathtracer_tpu.types import Material

    sc = scenes._scene_from_lists(
        [[0.0, -0.5, 1.0], [0.9, -0.35, 1.3], [-0.85, -0.62, 0.9]],
        [0.4, 0.3, 0.35],
        [[0.1, 0.2, 0.5], [0.8, 0.6, 0.2], [0.7, 0.15, 0.15]],
        [Material.LAMBERTIAN] * 3, [0.0] * 3, [1.5] * 3,
        scenes.SHIRLEY_SKY_LO, scenes.SHIRLEY_SKY_HI,
    )
    truth = scenes.with_ground_plane(sc)
    cam = spt.make_camera(origin=(0.0, 0.5, -1.2), lookat=(0.0, -0.35, 1.0),
                          vfov_deg=55)
    from simplepathtracer_tpu.render import grad_safe_config

    cfg = grad_safe_config(spt.RenderConfig(
        width=256, height=128, spp=128, max_depth=5, use_pallas=True,
        silhouette_softness=0.05,
    ))
    key = jax.random.PRNGKey(0)
    target = inverse.render_linear(
        truth, cam, cfg.replace(silhouette_softness=0.0),
        jax.random.PRNGKey(42),
    )
    start = truth.replace(radii=truth.radii.at[0].set(0.30))
    mask = {"radii": jnp.zeros((3,), jnp.float32).at[0].set(1.0)}
    rec, _ = inverse.fit(
        start, target, cam, cfg, key, steps=80, lr=2e-2,
        leaves=("radii",), param_mask=mask, softness=0.05,
    )
    err0, err1 = 0.1, abs(float(rec.radii[0]) - 0.4)
    assert err1 < err0 * 0.2, f"buried-radius fit did not converge: {err1:.4f}"
