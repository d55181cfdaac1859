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
    camera_jitter,
    in_unit_ball,
    ray_keys,
    threefry2x32,
    unit_sphere_surface,
)


def _uniforms(n, seed=0):
    k = jax.random.PRNGKey(seed)
    return jax.random.uniform(k, (n, 3))


def test_threefry_matches_jax_prng():
    """Our hand-vectorized cipher must agree with jax's own threefry2x32."""
    k = jax.random.PRNGKey(123)
    kd = k if k.dtype == jnp.uint32 else jax.random.key_data(k)
    c0 = jnp.arange(64, dtype=jnp.uint32)
    c1 = jnp.arange(64, dtype=jnp.uint32) * jnp.uint32(7)
    ours0, ours1 = threefry2x32(kd[0], kd[1], c0, c1)
    from jax._src.prng import threefry_2x32 as jax_tf

    theirs = jax_tf(kd, jnp.concatenate([c0, c1]))
    np.testing.assert_array_equal(np.asarray(ours0), np.asarray(theirs[:64]))
    np.testing.assert_array_equal(np.asarray(ours1), np.asarray(theirs[64:]))


def test_unit_sphere_surface_uniform():
    u = _uniforms(4096)
    v = np.asarray(unit_sphere_surface(u[:, 0], u[:, 1]))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # Uniformity: component means near 0, second moments match sphere (1/3).
    assert np.abs(v.mean(0)).max() < 0.05
    np.testing.assert_allclose((v**2).mean(0), 1.0 / 3.0, atol=0.03)


def test_in_unit_ball_uniform():
    u = _uniforms(8192, seed=1)
    v = np.asarray(in_unit_ball(u[:, 0], u[:, 1], u[:, 2]))
    r = np.linalg.norm(v, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # Uniform ball: E[r] = 3/4, E[r^2] = 3/5.
    np.testing.assert_allclose(r.mean(), 0.75, atol=0.02)
    np.testing.assert_allclose((r**2).mean(), 0.6, atol=0.02)


def test_ray_keys_deterministic_and_distinct():
    base = jax.random.PRNGKey(42)
    ctx = ray_keys(base, jnp.arange(256), jnp.zeros(256, jnp.int32))
    u1 = np.asarray(bounce_noise(ctx, 0))
    u2 = np.asarray(bounce_noise(ctx, 0))
    np.testing.assert_array_equal(u1, u2)
    # Distinct samples give distinct noise.
    ctx_s1 = ray_keys(base, jnp.arange(256), jnp.ones(256, jnp.int32))
    assert not np.array_equal(u1, np.asarray(bounce_noise(ctx_s1, 0)))
    # Distinct base keys give distinct noise.
    ctx_k = ray_keys(jax.random.PRNGKey(43), jnp.arange(256), jnp.zeros(256, jnp.int32))
    assert not np.array_equal(u1, np.asarray(bounce_noise(ctx_k, 0)))
    # All pixels distinct.
    assert len({tuple(r) for r in u1}) == 256


def test_bounce_noise_decorrelated_and_uniform():
    base = jax.random.PRNGKey(0)
    ctx = ray_keys(base, jnp.arange(4096), jnp.zeros(4096, jnp.int32))
    u0 = np.asarray(bounce_noise(ctx, 0))
    u1 = np.asarray(bounce_noise(ctx, 1))
    assert u0.shape == (4096, 8)
    assert not np.allclose(u0, u1)
    assert (u0 >= 0).all() and (u0 < 1).all()
    # Marginals look uniform: mean ~ 0.5, var ~ 1/12.
    np.testing.assert_allclose(u0.mean(0), 0.5, atol=0.03)
    np.testing.assert_allclose(u0.var(0), 1.0 / 12.0, atol=0.01)
    # No correlation between bounces.
    c = np.corrcoef(u0[:, 0], u1[:, 0])[0, 1]
    assert abs(c) < 0.05


def test_camera_jitter_shape_and_range():
    ctx = ray_keys(jax.random.PRNGKey(9), jnp.arange(128), jnp.zeros(128, jnp.int32))
    j = np.asarray(camera_jitter(ctx))
    assert j.shape == (128, 4)
    assert (j >= 0).all() and (j < 1).all()
    # Camera slots must not collide with bounce slots 0..123.
    u_last_bounce = np.asarray(bounce_noise(ctx, 30))
    assert not np.allclose(j[:, :2], u_last_bounce[:, :2])
