"""Ray-plane intersection.

Reference counterpart: ``cd::RayPlaneIntersection`` /
``CalculateRayPlaneContactPoint`` (include/Collision.hpp:73-85) and the
plane constants in include/Globals.hpp:26-27.  In the reference this is
**dead code** — no tracer ever calls it; the ground is a huge sphere
instead (SceneGenerators.hpp:84, 97).  This module provides the batched,
differentiable equivalent with the same standalone status: available for
scene construction (an infinite ground plane is cheaper and better-
conditioned than a radius-1e6 sphere) but not wired into the default
sphere-scene tracers, matching the reference's actual behavior.

Plane parameterization: (normal n, offset k) with the surface defined by
dot(n, p) + k == 0 — the reference's (planeNormal, planeDistance) pair.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PlaneHit(NamedTuple):
    t: jax.Array       # [N] f32 — hit parameter (t_max if miss)
    hit: jax.Array     # [N] bool
    point: jax.Array   # [N, 3] f32
    normal: jax.Array  # [N, 3] f32 — face-forward (against the ray)


def ray_plane_intersection(
    origins, dirs, normal, offset, t_min=1e-3, t_max=3.0e7
) -> PlaneHit:
    """Batched ray vs single infinite plane.

    origins, dirs: [N, 3]; normal: [3] (need not be unit — normalized
    here); offset: scalar k with plane = {p : dot(n, p) + k = 0}.
    Differentiable w.r.t. normal/offset away from the parallel
    configuration (denominator clamped).
    """
    n = jnp.asarray(normal, jnp.float32)
    n = n / jnp.sqrt(jnp.sum(n * n) + 1e-20)
    denom = jnp.sum(dirs * n, axis=-1)                       # [N]
    num = -(jnp.sum(origins * n, axis=-1) + offset)          # [N]
    # Parallel rays (denom ~ 0) never hit; keep the division finite.
    safe = jnp.where(jnp.abs(denom) > 1e-8, denom, 1.0)
    t = num / safe
    hit = (jnp.abs(denom) > 1e-8) & (t > t_min) & (t < t_max)
    t = jnp.where(hit, t, t_max)
    point = origins + t[:, None] * dirs
    # Face-forward: the normal opposing the incoming ray.
    face = jnp.where(denom[:, None] > 0, -n, n)
    face = jnp.broadcast_to(face, point.shape)
    return PlaneHit(t=t, hit=hit, point=point, normal=face)
