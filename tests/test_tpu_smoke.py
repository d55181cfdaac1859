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
    # pixels may flip single samples.
    assert d.mean() < 1e-4, f"mean diff {d.mean()}"
    assert (d > 1e-3).mean() < 5e-3, f"outlier fraction {(d > 1e-3).mean()}"
