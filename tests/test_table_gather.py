"""ops/table_gather: custom-VJP fused gather == plain gather (fwd + grad)."""

import jax
import jax.numpy as jnp
import numpy as np

import simplepathtracer_tpu as spt
from simplepathtracer_tpu.ops.table_gather import gather_rows, pack_tables


def test_gather_rows_matches_plain_gather_and_vjp():
    key = jax.random.PRNGKey(0)
    s, k, n = 37, 9, 1000  # n not a multiple of the chunk
    table = jax.random.normal(key, (s, k), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, s, jnp.int32)
    ct = jax.random.normal(jax.random.PRNGKey(2), (n, k), jnp.float32)

    out = gather_rows(table, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[idx]))

    g_custom = jax.vjp(lambda t: gather_rows(t, idx), table)[1](ct)[0]
    g_plain = jax.vjp(lambda t: t[idx], table)[1](ct)[0]
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_plain), rtol=1e-5, atol=1e-5
    )


def test_bucket_rows_pallas_matches_jnp():
    """Pallas bucket kernel (interpret) == jnp one-hot bucketing == XLA
    scatter-add, including ray padding and bucket padding."""
    from simplepathtracer_tpu.ops.pallas_bucket import bucket_rows_pallas
    from simplepathtracer_tpu.ops.table_gather import bucket_rows

    s, k, n = 37, 9, 1311  # non-multiples of every kernel tile size
    idx = jax.random.randint(jax.random.PRNGKey(5), (n,), 0, s, jnp.int32)
    ct = jax.random.normal(jax.random.PRNGKey(6), (n, k), jnp.float32)
    a = np.asarray(bucket_rows_pallas(ct, idx, s, interpret=True))
    b = np.asarray(bucket_rows(ct, idx, s))
    c = np.asarray(jnp.zeros((s, k)).at[idx].add(ct))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(a, c, rtol=1e-5, atol=1e-5)


def test_pack_tables_gradient_splits_to_leaves():
    scene = spt.three_sphere_scene()
    idx = jnp.asarray([0, 2, 1, 3, 0], jnp.int32)

    def f(centers, radii):
        sc = scene.replace(centers=centers, radii=radii)
        return jnp.sum(gather_rows(pack_tables(sc), idx) ** 2)

    g1 = jax.grad(f, argnums=(0, 1))(scene.centers, scene.radii)

    def f_plain(centers, radii):
        return jnp.sum(centers[idx] ** 2) + jnp.sum(radii[idx] ** 2) + jnp.sum(
            scene.albedo[idx] ** 2
        ) + jnp.sum(scene.fuzz[idx] ** 2) + jnp.sum(scene.ior[idx] ** 2)

    g2 = jax.grad(f_plain, argnums=(0, 1))(scene.centers, scene.radii)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
