"""Camera ray generation.

Reference counterpart: the per-sample jittered NDC ray
``Normalize(viewMatrix * {-1+2v, -1+2u, 1})`` built from a transposed
camera-basis matrix (include/SingleThreadPathTracer.hpp:125-128,
include/Renderer.hpp:321, include/Math.hpp:198-231).  Notes on divergence:
the reference swaps u/v (u from y but divided by width), and its Cross
product has a broken z term (Math.hpp:118) so its basis is skewed; per
SURVEY.md S2 we match the physics, not the bugs.  This camera is the correct
orthonormal look-at basis with vertical FOV plus Shirley's thin-lens defocus
blur (BASELINE config 3), pinhole when aperture == 0.
"""

from __future__ import annotations

import jax.numpy as jnp

from .types import Camera


def _cross(a, b):
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def _normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-20)


def camera_basis(cam: Camera):
    """Right-handed orthonormal (u, v, w): w looks *backwards* (Shirley)."""
    w = _normalize(cam.origin - cam.lookat)
    u = _normalize(_cross(cam.vup, w))
    v = _cross(w, u)
    return u, v, w


def generate_rays(cam: Camera, width, height, pixel_ids, jitter):
    """Primary rays for flattened pixel ids.

    Args:
      pixel_ids: [N] i32, pixel = y * width + x with y=0 the TOP row.
      jitter: [N, 4] uniforms — [:, :2] subpixel jitter, [:, 2:] lens disk.

    Returns (origins [N,3], dirs [N,3]) with unit dirs.
    """
    x = (pixel_ids % width).astype(jnp.float32)
    y = (pixel_ids // width).astype(jnp.float32)
    s = (x + jitter[:, 0]) / width          # [0,1] left->right
    t = 1.0 - (y + jitter[:, 1]) / height   # [0,1] bottom->top

    u, v, w = camera_basis(cam)
    aspect = width / height
    half_h = jnp.tan(jnp.deg2rad(cam.vfov_deg) * 0.5)
    half_w = aspect * half_h
    fd = cam.focus_dist

    lower_left = cam.origin - fd * (half_w * u + half_h * v + w)
    horizontal = 2.0 * half_w * fd * u
    vertical = 2.0 * half_h * fd * v

    # Thin-lens origin offset: uniform unit-disk point scaled by aperture/2.
    r = jnp.sqrt(jitter[:, 2])
    theta = 2.0 * jnp.pi * jitter[:, 3]
    lens = 0.5 * cam.aperture
    offset = (r * jnp.cos(theta) * lens)[:, None] * u + (
        r * jnp.sin(theta) * lens
    )[:, None] * v

    origins = cam.origin + offset
    dirs = _normalize(
        lower_left + s[:, None] * horizontal + t[:, None] * vertical - origins
    )
    return origins, dirs
