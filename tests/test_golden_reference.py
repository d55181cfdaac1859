"""Golden comparison against the reference's own shipped renders.

The ONLY ground truth the reference publishes is seven rendered BMPs
(/root/reference/images/1.bmp-7.bmp, 1080x1080; SURVEY.md S4).  7.bmp is
the closest to the final code state: the REFERENCE scene (InitSpheres,
SceneGenerators.hpp:68-133) through its recursive tracer.  Comparison is
perceptual/statistical, not pixelwise: the reference camera basis is skewed
by the Cross-product bug (Math.hpp:118), its diffuse bounce adds the hit
point into the scatter direction (SingleThreadPathTracer.hpp:32), and its
RNG is wall-clock seeded — documented divergences (PARITY.md), so we pin
structure and radiometry with generous bounds rather than bits.
"""

import os

import jax
import numpy as np
import pytest

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import io as sptio
from simplepathtracer_tpu.oracle.ref_exact import (
    render_ref_exact,
    scene_5bmp,
    scene_6bmp,
    scene_7bmp,
)

REF_BMP = "/root/reference/images/7.bmp"


def _lum(x):
    return x @ np.array([0.299, 0.587, 0.114], np.float32)


def _ref_downsampled(k=8):
    side = 1080 // k
    ref = sptio.read_bmp(REF_BMP).astype(np.float32) / 255.0
    return ref.reshape(side, k, side, k, 3).mean(axis=(1, 3)), side


@pytest.mark.skipif(not os.path.exists(REF_BMP), reason="reference images absent")
def test_ref_exact_oracle_pins_shipped_bmp():
    """Bug-for-bug semantics (oracle/ref_exact.py) + the documented
    7.bmp-era scene state must pin the shipped render TIGHTLY — corr >=
    0.95, MAD <= 0.06 (measured 0.985 / 0.017; the loose statistical test
    below covers the intended-semantics DEFAULT path)."""
    ref_ds, side = _ref_downsampled()
    colors, materials = scene_7bmp()
    img = render_ref_exact(side=side, spp=24, seed=0, colors=colors,
                           materials=materials)
    corr = float(np.corrcoef(_lum(img).ravel(), _lum(ref_ds).ravel())[0, 1])
    mad = float(np.abs(img - ref_ds).mean())
    assert corr >= 0.95, f"ref-exact luminance correlation too low: {corr:.4f}"
    assert mad <= 0.06, f"ref-exact mean abs diff too large: {mad:.4f}"


@pytest.mark.skipif(not os.path.exists(REF_BMP), reason="reference images absent")
def test_ref_exact_semantics_diverge_from_intended():
    """The quirks are load-bearing: the same oracle WITHOUT the era scene
    (i.e. today's InitSpheres materials) measurably drops correlation —
    guards against the tight test silently passing for the wrong reason."""
    ref_ds, side = _ref_downsampled()
    img = render_ref_exact(side=side, spp=24, seed=0)  # current-code scene
    corr = float(np.corrcoef(_lum(img).ravel(), _lum(ref_ds).ravel())[0, 1])
    assert 0.80 < corr < 0.95, f"expected mid-range corr, got {corr:.4f}"


@pytest.mark.skipif(not os.path.exists(REF_BMP), reason="reference images absent")
def test_reference_scene_matches_shipped_bmp():
    k = 8
    side = 1080 // k  # 135
    ref = sptio.read_bmp(REF_BMP).astype(np.float32) / 255.0
    ref_ds = ref.reshape(side, k, side, k, 3).mean(axis=(1, 3))

    scene = spt.reference_scene()
    cam = spt.make_camera(origin=(0, 1, -3), lookat=(0, 1, 0), vfov_deg=90)
    cfg = spt.RenderConfig(width=side, height=side, spp=32, max_depth=10)
    img = np.asarray(spt.render(scene, cam, cfg, jax.random.PRNGKey(0)))

    # Global radiometry: mean abs diff in gamma space (measured 0.088; the
    # residual is the reference's darker ground from its buggy diffuse
    # bounce + 7.bmp's older scene state — see oracle/ref_exact.py).
    mad = float(np.abs(img - ref_ds).mean())
    assert mad < 0.12, f"mean abs diff vs reference BMP too large: {mad:.4f}"

    # Structure: luminance correlation across the frame (measured 0.876).
    # The tight pin lives in test_ref_exact_oracle_pins_shipped_bmp; this
    # bound guards the intended-semantics DEFAULT path.
    corr = float(np.corrcoef(_lum(img).ravel(), _lum(ref_ds).ravel())[0, 1])
    assert corr > 0.82, f"luminance correlation too low: {corr:.4f}"

    # Radiometric anchor: the sky gradient region should agree closely —
    # both implement initColor * (dir.y+1)/2 (SingleThreadPathTracer.hpp:11)
    # and it is bounce-free (measured agreement ~1e-4).
    sky_ours = float(img[:20].mean())
    sky_ref = float(ref_ds[:20].mean())
    assert abs(sky_ours - sky_ref) < 0.05, (sky_ours, sky_ref)


def _pin(bmp, colors, materials, spp=24, seed=0):
    k = 8
    side = 1080 // k
    ref = sptio.read_bmp(bmp).astype(np.float32) / 255.0
    ref_ds = ref.reshape(side, k, side, k, 3).mean(axis=(1, 3))
    img = render_ref_exact(side=side, spp=spp, seed=seed, colors=colors,
                           materials=materials)
    corr = float(np.corrcoef(_lum(img).ravel(), _lum(ref_ds).ravel())[0, 1])
    mad = float(np.abs(img - ref_ds).mean())
    return corr, mad


@pytest.mark.skipif(
    not os.path.exists("/root/reference/images/5.bmp"),
    reason="reference images absent",
)
def test_ref_exact_oracle_pins_5bmp():
    """Round-4 forensics: 5.bmp = today's color table, all nine spheres
    DIFFUSE (patch colorimetry, oracle/ref_exact.py docstring).  Measured
    corr 0.986 / MAD 0.032 — as tight as the 7.bmp pin."""
    corr, mad = _pin("/root/reference/images/5.bmp", *scene_5bmp())
    assert corr >= 0.95, f"5.bmp correlation too low: {corr:.4f}"
    assert mad <= 0.06, f"5.bmp MAD too large: {mad:.4f}"


@pytest.mark.skipif(
    not os.path.exists("/root/reference/images/6.bmp"),
    reason="reference images absent",
)
def test_ref_exact_oracle_pins_6bmp():
    """6.bmp = the 7-era purple colors[1] + a REFRACTIVE center sphere.
    Measured corr 0.952 / MAD 0.037; the residual is the era glass's
    near-white rendering, which the final code state's documented glass
    (transmissive) cannot reproduce — see the oracle docstring."""
    corr, mad = _pin("/root/reference/images/6.bmp", *scene_6bmp())
    assert corr >= 0.92, f"6.bmp correlation too low: {corr:.4f}"
    assert mad <= 0.07, f"6.bmp MAD too large: {mad:.4f}"
