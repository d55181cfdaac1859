"""Where does the fwd+bwd time go? (round-2 north-star experiment)

Measures, on the real chip:
  1. microbench: [N] gather from a [512] table, and its VJP (scatter-add)
  2. fwd-only jnp bounce (+pallas hits) through render_sample_batch
  3. value_and_grad of pixel MSE: albedo-only vs all leaves

Timing: second of two identical calls, sync on tiny fetch (CLAUDE.md).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from simplepathtracer_tpu._cache import enable_compilation_cache

enable_compilation_cache()

import simplepathtracer_tpu as spt
from simplepathtracer_tpu import inverse
from simplepathtracer_tpu.render import grad_safe_config, render_sample_batch

W, H, DEPTH, SPP = 1200, 800, 10, 1
N = W * H * SPP


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, out


def micro_gather_scatter():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, 512, jnp.int32)
    table = jax.random.normal(key, (512, 3), jnp.float32)
    ct = jnp.ones((N, 3), jnp.float32)

    g = jax.jit(lambda t: t[idx])
    dt, _ = timed(g, table)
    print(f"gather   [{N}] from [512,3]: {dt*1e3:8.2f} ms")

    vjp = jax.jit(lambda t: jax.vjp(lambda tt: tt[idx], t)[1](ct)[0])
    dt, _ = timed(vjp, table)
    print(f"scatter+ [{N}] into [512,3]: {dt*1e3:8.2f} ms")

    # one-hot matmul alternative for the scatter-add, chunked
    def onehot_accum(t):
        def chunk(acc, i):
            sl = jax.lax.dynamic_slice(idx, (i * 65536,), (65536,))
            cs = jax.lax.dynamic_slice(ct, (i * 65536, 0), (65536, 3))
            oh = (sl[:, None] == jnp.arange(512)[None, :]).astype(jnp.float32)
            return acc + oh.T @ cs, None

        acc, _ = jax.lax.scan(chunk, jnp.zeros((512, 3)), jnp.arange(N // 65536))
        return acc

    dt, _ = timed(jax.jit(onehot_accum), table)
    print(f"onehot-accum alternative   : {dt*1e3:8.2f} ms")


def render_paths():
    scene = spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512)
    from simplepathtracer_tpu.scenes import compact_scene

    scene = compact_scene(scene)
    cam = spt.make_camera(origin=(13, 2, 3), lookat=(0, 0, 0), vfov_deg=20,
                          aperture=0.1, focus_dist=10.0)
    cfg = spt.RenderConfig(width=W, height=H, spp=SPP, max_depth=DEPTH,
                           use_pallas=True)
    gcfg = grad_safe_config(cfg)
    key = jax.random.PRNGKey(1)
    paths = W * H * SPP

    fwd = jax.jit(lambda s: render_sample_batch(s, cam, gcfg, key, 0, SPP))
    dt, _ = timed(fwd, scene)
    print(f"fwd jnp+hits             : {dt*1e3:8.1f} ms  {paths/dt/1e6:6.2f} Mpaths/s")

    target = jnp.zeros((H, W, 3), jnp.float32)
    for leaves in (("albedo",), inverse.DIFF_LEAVES):
        try:
            params = {k: getattr(scene, k) for k in leaves}
            vg = jax.jit(
                lambda p: jax.value_and_grad(inverse.pixel_loss)(
                    p, scene, target, cam, gcfg, key, tuple(p)
                )
            )
            dt, _ = timed(vg, params)
            print(f"fwd+bwd leaves={len(leaves)}        : {dt*1e3:8.1f} ms  {paths/dt/1e6:6.2f} Mpaths/s")
        except Exception as e:
            print(f"fwd+bwd leaves={len(leaves)} FAILED: {type(e).__name__} {str(e)[:200]}")


if __name__ == "__main__":
    print("device:", jax.devices()[0])
    micro_gather_scatter()
    render_paths()
