"""Unit tests for ray-sphere intersection vs closed-form cases.

Covers the cases SURVEY.md S4 names: tangent rays, inside-sphere origins,
negative-radius hollow glass, plus closest-hit selection and huge-ground
numerics.  Reference semantics under test: include/Collision.hpp:9-109.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simplepathtracer_tpu.ops.intersect import intersect_scene, ray_sphere_ts
from simplepathtracer_tpu.types import Scene


def _scene(centers, radii):
    centers = jnp.asarray(centers, jnp.float32)
    radii = jnp.asarray(radii, jnp.float32)
    s = centers.shape[0]
    return Scene(
        centers=centers,
        radii=radii,
        albedo=jnp.ones((s, 3)),
        material=jnp.zeros((s,), jnp.int32),
        fuzz=jnp.zeros((s,)),
        ior=jnp.full((s,), 1.5),
        sky_lo=jnp.zeros(3),
        sky_hi=jnp.ones(3),
    )


def _rays(origins, dirs):
    o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
    return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_head_on_hit():
    o, d = _rays([[0, 0, -3]], [[0, 0, 1]])
    hit = intersect_scene(o, d, _scene([[0, 0, 0]], [1.0]))
    assert bool(hit.hit[0])
    np.testing.assert_allclose(hit.t[0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(hit.point[0], [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(hit.normal[0], [0, 0, -1], atol=1e-5)


def test_miss():
    o, d = _rays([[0, 5, -3]], [[0, 0, 1]])
    hit = intersect_scene(o, d, _scene([[0, 0, 0]], [1.0]))
    assert not bool(hit.hit[0])


def test_tangent_grazing_no_hit():
    # Ray exactly tangent: disc == 0 => not a hit (strict inequality).
    o, d = _rays([[0, 1, -3]], [[0, 0, 1]])
    hit = intersect_scene(o, d, _scene([[0, 0, 0]], [1.0]))
    assert not bool(hit.hit[0])


def test_origin_inside_sphere_far_root():
    o, d = _rays([[0, 0, 0]], [[0, 0, 1]])
    hit = intersect_scene(o, d, _scene([[0, 0, 0]], [1.0]))
    assert bool(hit.hit[0])
    np.testing.assert_allclose(hit.t[0], 1.0, rtol=1e-5)
    # Outward normal at exit point points along +z.
    np.testing.assert_allclose(hit.normal[0], [0, 0, 1], atol=1e-5)


def test_negative_radius_flips_normal():
    o, d = _rays([[0, 0, -3]], [[0, 0, 1]])
    hit = intersect_scene(o, d, _scene([[0, 0, 0]], [-1.0]))
    assert bool(hit.hit[0])
    np.testing.assert_allclose(hit.t[0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(hit.normal[0], [0, 0, 1], atol=1e-5)  # inward


def test_closest_hit_selection():
    sc = _scene([[0, 0, 5], [0, 0, 2]], [0.5, 0.5])
    o, d = _rays([[0, 0, 0]], [[0, 0, 1]])
    hit = intersect_scene(o, d, sc)
    assert int(hit.index[0]) == 1
    np.testing.assert_allclose(hit.t[0], 1.5, rtol=1e-5)


def test_behind_ray_not_hit():
    o, d = _rays([[0, 0, 3]], [[0, 0, 1]])
    hit = intersect_scene(o, d, _scene([[0, 0, 0]], [1.0]))
    assert not bool(hit.hit[0])


def test_t_min_skips_self_hit():
    # Ray starting exactly on the surface going outward must not re-hit.
    o, d = _rays([[0, 0, -1]], [[0, 0, -1]])
    hit = intersect_scene(o, d, _scene([[0, 0, 0]], [1.0]))
    assert not bool(hit.hit[0])


def test_huge_ground_sphere_accuracy():
    # fp32 ground-sphere hit within ~1e-2 of float64 truth at r=1e4.
    r = 1e4
    sc = _scene([[0.0, -r, 0.0]], [r])
    o, d = _rays([[0, 1, 0]], [[0.3, -1, 0.2]])
    hit = intersect_scene(o, d, sc)
    dn = np.asarray(d[0], np.float64)
    on = np.asarray(o[0], np.float64)
    c = np.array([0.0, -r, 0.0])
    oc = c - on
    tc = oc @ dn
    t64 = tc - np.sqrt(r * r - (oc @ oc - tc * tc))
    assert bool(hit.hit[0])
    np.testing.assert_allclose(hit.t[0], t64, atol=2e-2)
    # Normal should be ~+y at the hit point.
    assert float(hit.normal[0, 1]) > 0.999


def test_vs_numpy_quadratic_random():
    # Fuzz: 256 random rays x 32 random spheres against float64 quadratic.
    rng = np.random.default_rng(0)
    o = rng.normal(size=(256, 3)).astype(np.float32)
    d = rng.normal(size=(256, 3))
    d = (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
    c = (rng.normal(size=(32, 3)) * 4).astype(np.float32)
    r = rng.uniform(0.2, 2.0, size=32).astype(np.float32)

    t, valid = ray_sphere_ts(jnp.asarray(o), jnp.asarray(d), jnp.asarray(c), jnp.asarray(r), 1e-3)
    t = np.asarray(t)
    valid = np.asarray(valid)

    o64, d64, c64, r64 = (x.astype(np.float64) for x in (o, d, c, r))
    oc = c64[None] - o64[:, None]  # [N,S,3]
    tc = np.einsum("nsk,nk->ns", oc, d64)
    disc = r64[None] ** 2 - (np.einsum("nsk,nsk->ns", oc, oc) - tc**2)
    v64 = disc > 0
    sq = np.sqrt(np.maximum(disc, 0))
    tn, tf = tc - sq, tc + sq
    t64 = np.where(tn > 1e-3, tn, tf)

    # Validity agrees away from the tangent knife-edge; fp32 disc error
    # scales with the magnitudes entering it (~|oc|^2 * eps), so the
    # exclusion band is relative.
    scale = np.einsum("nsk,nsk->ns", oc, oc) + r64[None] ** 2
    robust = np.abs(disc) > 1e-5 * scale
    assert (valid == v64)[robust].all()
    m = v64 & robust
    np.testing.assert_allclose(t[m], t64[m], atol=2e-3, rtol=1e-3)


def test_gradients_smooth_away_from_grazing():
    # d t / d center and d t / d radius vs finite differences (SURVEY.md S4 item 3).
    sc = _scene([[0.1, -0.2, 4.0]], [1.0])
    o, d = _rays([[0, 0, 0]], [[0, 0, 1]])

    def t_of(centers, radii):
        s2 = sc.replace(centers=centers, radii=radii)
        return intersect_scene(o, d, s2).t[0]

    g_c, g_r = jax.grad(t_of, argnums=(0, 1))(sc.centers, sc.radii)
    eps = 1e-3
    for axis in range(3):
        dc = jnp.zeros((1, 3)).at[0, axis].set(eps)
        fd = (t_of(sc.centers + dc, sc.radii) - t_of(sc.centers - dc, sc.radii)) / (2 * eps)
        np.testing.assert_allclose(g_c[0, axis], fd, atol=2e-2)
    fd_r = (t_of(sc.centers, sc.radii + eps) - t_of(sc.centers, sc.radii - eps)) / (2 * eps)
    np.testing.assert_allclose(g_r[0], fd_r, atol=2e-2)
