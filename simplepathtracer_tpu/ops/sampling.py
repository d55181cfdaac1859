"""Stateless, counter-based sampling.

The reference uses a wall-clock-seeded ``thread_local`` splitmix engine
(include/Random.hpp:11-46, 86-93): renders are irreproducible and the random
stream depends on the thread schedule.  The TPU build derives every random
number from ``fold_in`` chains over *global* ray ids:

    ray_key    = fold_in(fold_in(base_key, pixel_id), sample_id)
    bounce_key = fold_in(fold_in(ray_key, bounce), stream)

so the image is a pure function of ``base_key`` and is bit-identical under
any sharding of pixels/samples across chips — the determinism guardrail
SURVEY.md S5 calls for.

Direction samplers replace include/Random.hpp:95-141 with the *intended*
semantics (the reference's "inside sphere" sampler inverts its rejection test
and actually samples a shell, and its "normal dist" sampler is a copy of the
uniform one — SURVEY.md S2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_keys(base_key, pixel_ids, sample_ids):
    """Per-ray keys from global (pixel, sample) ids. Shapes broadcast."""
    fold = jax.vmap(jax.random.fold_in, in_axes=(None, 0))
    pixel_ids, sample_ids = jnp.broadcast_arrays(
        jnp.asarray(pixel_ids, jnp.uint32), jnp.asarray(sample_ids, jnp.uint32)
    )
    keys = fold(base_key, pixel_ids.reshape(-1))
    keys = jax.vmap(jax.random.fold_in)(keys, sample_ids.reshape(-1))
    return keys.reshape(pixel_ids.shape + keys.shape[1:]) if keys.ndim > 1 else keys


def bounce_noise(keys, bounce):
    """All randomness one bounce step needs, per ray.

    Returns (gauss [N, 6], unif [N, 3]): gauss[:, :3] drives the Lambertian
    unit vector, gauss[:, 3:] the metal fuzz sphere vector; unif[:, 0] is the
    in-sphere radius cube-root draw, unif[:, 1] the dielectric
    reflect-vs-refract coin, unif[:, 2] spare (Russian roulette).
    """
    kb = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, jnp.uint32(bounce))
    kg = jax.vmap(jax.random.fold_in, in_axes=(0, None))(kb, jnp.uint32(1))
    ku = jax.vmap(jax.random.fold_in, in_axes=(0, None))(kb, jnp.uint32(2))
    gauss = jax.vmap(lambda k: jax.random.normal(k, (6,), jnp.float32))(kg)
    unif = jax.vmap(lambda k: jax.random.uniform(k, (3,), jnp.float32))(ku)
    return gauss, unif


def unit_vectors(gauss3):
    """Uniform points on the unit sphere from 3 Gaussians (grad-safe norm)."""
    norm = jnp.sqrt(jnp.sum(gauss3 * gauss3, -1, keepdims=True) + 1e-12)
    return gauss3 / norm


def in_sphere_vectors(gauss3, u):
    """Uniform points inside the unit ball: unit vector scaled by u^(1/3).

    Intended semantics of include/Random.hpp:115-127 (whose rejection test is
    inverted; it really samples the shell between the unit sphere and its
    bounding cube — we implement the textbook ball).
    """
    return unit_vectors(gauss3) * jnp.cbrt(u)[..., None]


def camera_jitter(keys):
    """Per-ray (2 pixel-jitter, 2 lens-disk) uniforms.

    Reference: per-sample jitter u,v in [0,1) added to pixel coordinates
    (include/SingleThreadPathTracer.hpp:125-126); the lens draws support the
    defocus camera (BASELINE config 3) that the reference lacks.
    """
    kc = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, jnp.uint32(0xCA3))
    return jax.vmap(lambda k: jax.random.uniform(k, (4,), jnp.float32))(kc)
