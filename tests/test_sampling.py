"""Sampler distribution + RNG determinism tests (SURVEY.md S4 item 1).

The reference's samplers are irreproducible (wall-clock-seeded thread_local
engines, include/Random.hpp:40-44) and buggy (inverted in-sphere rejection,
Random.hpp:124).  These tests pin the intended distributions and the
counter-based key discipline that makes renders sharding-invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np

from simplepathtracer_tpu.ops.sampling import (
    bounce_noise,
    in_sphere_vectors,
    ray_keys,
    unit_vectors,
)


def test_unit_vectors_on_sphere():
    g = jax.random.normal(jax.random.PRNGKey(0), (4096, 3))
    v = np.asarray(unit_vectors(g))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # Uniformity: component means near 0, cos-latitude moments match sphere.
    assert np.abs(v.mean(0)).max() < 0.05
    np.testing.assert_allclose((v[:, 1] ** 2).mean(), 1.0 / 3.0, atol=0.03)


def test_in_sphere_vectors_uniform_in_ball():
    k = jax.random.PRNGKey(1)
    g = jax.random.normal(k, (8192, 3))
    u = jax.random.uniform(jax.random.PRNGKey(2), (8192,))
    v = np.asarray(in_sphere_vectors(g, u))
    r = np.linalg.norm(v, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # Uniform ball: E[r] = 3/4, E[r^2] = 3/5.
    np.testing.assert_allclose(r.mean(), 0.75, atol=0.02)
    np.testing.assert_allclose((r**2).mean(), 0.6, atol=0.02)


def test_ray_keys_unique_and_deterministic():
    base = jax.random.PRNGKey(42)
    k1 = ray_keys(base, jnp.arange(16), jnp.zeros(16, jnp.int32))
    k2 = ray_keys(base, jnp.arange(16), jnp.zeros(16, jnp.int32))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    # Distinct pixels and distinct samples give distinct keys.
    k3 = ray_keys(base, jnp.arange(16), jnp.ones(16, jnp.int32))
    assert not np.array_equal(np.asarray(k1), np.asarray(k3))
    flat = np.asarray(k1).reshape(16, -1)
    assert len({tuple(r) for r in flat}) == 16


def test_bounce_noise_decorrelated_across_bounces():
    base = jax.random.PRNGKey(0)
    keys = ray_keys(base, jnp.arange(256), jnp.zeros(256, jnp.int32))
    g0, u0 = bounce_noise(keys, 0)
    g1, u1 = bounce_noise(keys, 1)
    assert g0.shape == (256, 6) and u0.shape == (256, 3)
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    # Same call is reproducible.
    g0b, u0b = bounce_noise(keys, 0)
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g0b))
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u0b))
    # Uniforms are in [0,1).
    u = np.asarray(u0)
    assert (u >= 0).all() and (u < 1).all()
