"""Ray-plane intersection (reference Collision.hpp:73-85 semantics —
dead code there, standalone-but-tested here)."""

import jax
import jax.numpy as jnp
import numpy as np

from simplepathtracer_tpu.ops.plane import ray_plane_intersection


def _rays(o, d):
    o = jnp.asarray(o, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(d, jnp.float32).reshape(-1, 3)
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_straight_down_onto_ground():
    o, d = _rays([[0, 2, 0]], [[0, -1, 0]])
    h = ray_plane_intersection(o, d, normal=(0, 1, 0), offset=0.0)
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(h.point[0], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(h.normal[0], [0, 1, 0], atol=1e-6)


def test_parallel_ray_misses():
    o, d = _rays([[0, 1, 0]], [[1, 0, 0]])
    h = ray_plane_intersection(o, d, normal=(0, 1, 0), offset=0.0)
    assert not bool(h.hit[0])


def test_behind_ray_misses():
    o, d = _rays([[0, 2, 0]], [[0, 1, 0]])
    h = ray_plane_intersection(o, d, normal=(0, 1, 0), offset=0.0)
    assert not bool(h.hit[0])


def test_offset_plane_and_faceforward():
    # Plane y = 3 (n=(0,1,0), k=-3), ray from above: face normal points up
    # toward the ray (-? the ray travels -y so the forward face is +y).
    o, d = _rays([[0, 5, 0]], [[0, -1, 0]])
    h = ray_plane_intersection(o, d, normal=(0, 1, 0), offset=-3.0)
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], 2.0, rtol=1e-6)
    np.testing.assert_allclose(h.normal[0], [0, 1, 0], atol=1e-6)
    # From below, the face-forward normal flips.
    o2, d2 = _rays([[0, 0, 0]], [[0, 1, 0]])
    h2 = ray_plane_intersection(o2, d2, normal=(0, 1, 0), offset=-3.0)
    assert bool(h2.hit[0])
    np.testing.assert_allclose(h2.normal[0], [0, -1, 0], atol=1e-6)


def test_gradients_wrt_offset():
    o, d = _rays([[0.3, 2, 0.1]], [[0.1, -1, 0.05]])

    def t_of(k):
        return ray_plane_intersection(o, d, (0, 1, 0), k).t[0]

    g = jax.grad(t_of)(0.0)
    eps = 1e-3
    fd = (t_of(eps) - t_of(-eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)
