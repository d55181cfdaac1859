"""Side-by-side artifact + distances vs the reference's shipped BMPs.

Renders reference_scene and writes images/golden_side_by_side.png
(ours | reference 7.bmp, both 270x270) plus a JSON line of distances.
Documented divergences (PARITY.md): camera Cross bug, diffuse hit-point
bug, opaque-ish glass in the reference render.
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import io as sptio


def main(spp=128):
    k = 4
    side = 1080 // k
    ref = sptio.read_bmp("/root/reference/images/7.bmp").astype(np.float32) / 255.0
    ref_ds = ref.reshape(side, k, side, k, 3).mean(axis=(1, 3))

    scene = spt.reference_scene()
    cam = spt.make_camera(origin=(0, 1, -3), lookat=(0, 1, 0), vfov_deg=90)
    cfg = spt.RenderConfig(width=side, height=side, spp=spp, max_depth=10)
    img = np.asarray(spt.render(scene, cam, cfg, jax.random.PRNGKey(0)))

    lum = lambda x: x @ np.array([0.299, 0.587, 0.114], np.float32)
    out = {
        "mad_gamma": round(float(np.abs(img - ref_ds).mean()), 4),
        "lum_corr": round(float(np.corrcoef(lum(img).ravel(), lum(ref_ds).ravel())[0, 1]), 4),
        "sky_mean_ours": round(float(img[:40].mean()), 4),
        "sky_mean_ref": round(float(ref_ds[:40].mean()), 4),
        "spp": spp,
    }
    gap = np.ones((side, 8, 3), np.float32)
    sptio.save_image(
        "/root/repo/images/golden_side_by_side.png",
        np.concatenate([img, gap, ref_ds], axis=1),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
