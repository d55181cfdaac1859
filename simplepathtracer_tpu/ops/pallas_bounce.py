"""The wavefront bounce megakernel: one Pallas call = one full bounce.

Reference counterpart: the entire per-bounce body of both reference tracers
— closest-hit scan (include/Collision.hpp:87-109), material dispatch + color
math (include/SingleThreadPathTracer.hpp:11-112), and the RNG draws
(include/Random.hpp:86-141) — fused into a single TPU kernel.

Why a megakernel: profiling the jnp bounce on a v5e chip showed
~16 ms/bounce in the intersection kernel and ~38 ms/bounce in the jnp
"glue" around it (attribute gathers from the sphere tables, hit
reconstruction, scatter math, carry updates) — the glue cost 2.4x the
physics.  Fusing the whole bounce keeps the ray state on (8, 128) VPU
tiles in VMEM for the entire step; HBM traffic per bounce is ~15 f32 per
ray (the SoA ray state) instead of several KB.  The tile-level physics
(threefry RNG, unrolled sphere scan with inline winner-attribute tracking,
sky, scatter) lives in pallas_common.py, shared with the persistent
whole-render kernel.

NOT differentiable: this is a forward/rendering fast path.  Gradient work
uses the jnp bounce in render.py, which this kernel must match to fp
tolerance — tests/test_pallas_bounce.py asserts that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import (
    LANE,
    SUB,
    closest_hit_scan,
    hit_point_normal,
    pad_scene_tables,
    plane_override,
    scatter_tiles,
    sky_components,
    threefry2x32,
    to_unit_float,
    vma_union,
)

# Back-compat aliases (pallas_persistent historically imported these here).
_threefry2x32 = threefry2x32
_unit = to_unit_float

_SUB = SUB
_LANE = LANE
_BLOCK = _SUB * _LANE


def _bounce_kernel(
    # SMEM scene tables
    cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
    albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    sky_ref,   # f32[6]: lo rgb, hi rgb
    plane_ref, # f32[7]: ground plane (normal, offset, albedo); zeros if unused
    meta_ref,  # u32[3]: k0, k1, bounce
    # VMEM ray state (8,128) blocks
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tr_ref, tg_ref, tb_ref, rr_ref, rg_ref, rb_ref,
    alive_ref, pix_ref, samp_ref,
    # outputs
    n_ox, n_oy, n_oz, n_dx, n_dy, n_dz,
    n_tr, n_tg, n_tb, n_rr, n_rg, n_rb, n_alive,
    *, n_spheres: int, t_min: float, t_max: float, rr_start_depth: int = 0,
    use_plane: bool = False,
):
    tables = (
        cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
        albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    )
    alive = alive_ref[:] > 0.0

    def do_bounce():
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

        winner = closest_hit_scan(
            tables, ox, oy, oz, dx, dy, dz,
            n_spheres=n_spheres, t_min=t_min, t_max=t_max,
        )
        if use_plane:
            winner = plane_override(
                plane_ref, winner, ox, oy, oz, dx, dy, dz, t_min=t_min
            )
        (t, bi, cx, cy, cz, r, ar, ag, ab, mat, fz, io) = winner
        hit = bi >= 0
        px, py, pz, nx, ny, nz = hit_point_normal(
            ox, oy, oz, dx, dy, dz, t, cx, cy, cz, r
        )

        # RNG: 4 threefry evals -> 7 uniforms (slot map of ops/sampling.py).
        k0, k1, bounce = meta_ref[0], meta_ref[1], meta_ref[2]
        c0 = pix_ref[:]
        c1b = samp_ref[:] << jnp.uint32(8)
        slot0 = bounce * jnp.uint32(4)
        u = []
        for e in range(4):
            w0, w1 = threefry2x32(k0, k1, c0, c1b | (slot0 + jnp.uint32(e)))
            u.append(to_unit_float(w0))
            u.append(to_unit_float(w1))

        # Sky miss shader.
        tr, tg, tb = tr_ref[:], tg_ref[:], tb_ref[:]
        rr, rg, rb = rr_ref[:], rg_ref[:], rb_ref[:]
        skr, skg, skb = sky_components(sky_ref, dy)
        miss_f = jnp.where(alive & ~hit, 1.0, 0.0)
        rr = rr + tr * skr * miss_f
        rg = rg + tg * skg * miss_f
        rb = rb + tb * skb * miss_f

        sdx, sdy, sdz, atr, atg, atb, scattered = scatter_tiles(
            dx, dy, dz, nx, ny, nz, mat, ar, ag, ab, fz, io, u
        )

        live = alive & hit
        surv = live & scattered
        sf = jnp.where(surv, 1.0, 0.0)
        lf = jnp.where(live, 1.0, 0.0)
        ntr = tr * jnp.where(surv, atr, 1.0)
        ntg = tg * jnp.where(surv, atg, 1.0)
        ntb = tb * jnp.where(surv, atb, 1.0)
        # Directions update with the pre-RR survival mask — exactly like the
        # jnp bounce (render.py), where RR only rewrites `surviving`/tp after
        # d has been selected (dead rays' directions are never read again).
        n_ox[:] = ox + (px - ox) * lf
        n_oy[:] = oy + (py - oy) * lf
        n_oz[:] = oz + (pz - oz) * lf
        n_dx[:] = dx + (sdx - dx) * sf
        n_dy[:] = dy + (sdy - dy) * sf
        n_dz[:] = dz + (sdz - dz) * sf
        if rr_start_depth:
            # Russian roulette: same q / u6 column / boost as the jnp bounce
            # and the persistent kernel (unbiased early termination).
            q = jnp.clip(jnp.maximum(jnp.maximum(ntr, ntg), ntb), 0.05, 1.0)
            bt = jnp.full((_SUB, _LANE), bounce)
            do_rr = bt >= jnp.uint32(rr_start_depth)
            surv = surv & ~(do_rr & (u[6] >= q))
            boost = jnp.where(do_rr & surv, 1.0 / q, 1.0)
            ntr = ntr * boost
            ntg = ntg * boost
            ntb = ntb * boost
        n_tr[:] = ntr
        n_tg[:] = ntg
        n_tb[:] = ntb
        n_rr[:] = rr
        n_rg[:] = rg
        n_rb[:] = rb
        n_alive[:] = jnp.where(surv, 1.0, 0.0)

    def skip():
        n_ox[:] = ox_ref[:]
        n_oy[:] = oy_ref[:]
        n_oz[:] = oz_ref[:]
        n_dx[:] = dx_ref[:]
        n_dy[:] = dy_ref[:]
        n_dz[:] = dz_ref[:]
        n_tr[:] = tr_ref[:]
        n_tg[:] = tg_ref[:]
        n_tb[:] = tb_ref[:]
        n_rr[:] = rr_ref[:]
        n_rg[:] = rg_ref[:]
        n_rb[:] = rb_ref[:]
        n_alive[:] = jnp.zeros((_SUB, _LANE), jnp.float32)

    # Whole-block dead-ray skip (the TPU form of the wavefront tracer's
    # shrinking queues, include/TaskBasedPathTracer.hpp:81-193).
    jax.lax.cond(jnp.any(alive), do_bounce, skip)


@functools.partial(
    jax.jit, static_argnames=("t_min", "t_max", "rr_start_depth", "interpret")
)
def bounce_step_pallas(
    state, scene_tables, sky6, meta3, t_min=1e-3, t_max=3.0e7,
    rr_start_depth=0, interpret=False, plane7=None,
):
    """One bounce on SoA ray state.

    Args:
      state: tuple of 15 [R, 128] arrays — ox oy oz dx dy dz tr tg tb rr rg
        rb (f32), alive (f32), pix (u32), samp (u32); R*128 rays, R % 8 == 0.
      scene_tables: tuple of 11 [S] arrays — cx cy cz radius r2 albr albg
        albb (f32), mat (i32), fuzz ior (f32).
      sky6: f32[6] (sky_lo rgb, sky_hi rgb).  meta3: u32[3] (k0, k1, bounce).
      plane7: optional f32[7] Lambertian ground plane
        (scenes.with_ground_plane layout); None disables the plane test.

    Returns the 13 updated state arrays (ox..rb, alive).
    """
    use_plane = plane7 is not None
    if plane7 is None:
        plane7 = jnp.zeros((7,), jnp.float32)
    rows = state[0].shape[0]
    grid = (rows // _SUB,)
    blk = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    scene_tables = pad_scene_tables(scene_tables)
    s = scene_tables[0].shape[0]
    kernel = functools.partial(
        _bounce_kernel, n_spheres=s, t_min=float(t_min), t_max=float(t_max),
        rr_start_depth=int(rr_start_depth), use_plane=use_plane,
    )
    vma = vma_union(*state, meta3, *scene_tables, plane7)
    out_sds = [jax.ShapeDtypeStruct((rows, _LANE), jnp.float32, vma=vma)] * 13
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem] * 14 + [blk] * 15,
        out_specs=tuple([blk] * 13),
        out_shape=tuple(out_sds),
        cost_estimate=pl.CostEstimate(
            flops=30 * rows * _LANE * s,
            bytes_accessed=28 * 4 * rows * _LANE,
            transcendentals=8 * rows * _LANE * (s + 4),
        ),
        interpret=interpret,
    )(*scene_tables, sky6, plane7, meta3, *state)
