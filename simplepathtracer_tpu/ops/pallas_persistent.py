"""Persistent wavefront kernel: whole-render megakernel with in-lane ray
regeneration.

The bounce-per-launch megakernel (pallas_bounce.py) wastes VPU work on dead
lanes: lanes die independently (sky hit after ~2-3 bounces on open scenes)
but a 1024-ray block only skips its sphere scan when ALL lanes are dead,
which almost never happens before the depth budget.  Compaction on TPU
means cross-lane data movement — expensive and awkward.

The TPU-native answer is the classic persistent-threads design with a
twist that eliminates ALL data movement: **each lane owns one pixel**.
When a lane's path terminates (sky / absorption / depth), it banks the
radiance into an in-register accumulator and immediately regenerates the
camera ray for the SAME pixel's next sample — same lane, no shuffling.
A `lax.while_loop` runs until every lane has exhausted its sample budget;
with many samples per pixel, lane utilization approaches 100% regardless
of path-length variance (law of large numbers over samples).

One pallas_call renders an entire (pixel block x n_samples) tile:
  * ray state never leaves VMEM/registers — HBM traffic is pixel ids in,
    accumulated radiance out (~16 B/pixel TOTAL, not per bounce);
  * camera ray generation (pinhole + thin lens) runs in-kernel from ~20
    SMEM scalars;
  * RNG is the same counter-based threefry as everywhere (counters are
    per-lane (pixel, sample<<8|slot), so per-lane divergent sample/bounce
    indices are free) — the image is bit-compatible with the jnp path
    modulo fp reassociation;
  * expected sphere-scan count per lane is samples x (mean path length+1)
    instead of samples x max_depth — a ~2.5-3x work reduction at depth 10
    on open scenes.

Reference counterpart: this fuses the ENTIRE per-tile render loop
(include/SingleThreadPathTracer.hpp:114-137 — pixel/sample/bounce loops,
camera, RNG, shading) into one kernel; the regeneration trick is the TPU
form of the wavefront tracer's queue refill (TaskBasedPathTracer.hpp:61-79).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import (
    LANE as _LANE,
    SUB as _SUB,
    banked_lane_layout,
    camera_ray_tiles,
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

_BLOCK = _SUB * _LANE

# Default lane-bank count (single-accumulator flushing makes banks cheap;
# 16 measured best on v5e).  The adaptive balancer (render._balanced_perm)
# must agree with this to know the position -> (bank, lane) map.
DEFAULT_BANKS = 16


def _persistent_kernel(
    # SMEM scene tables
    cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
    albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    sky_ref,   # f32[6]
    plane_ref, # f32[7]: ground plane (normal, offset, albedo); zeros if unused
    cam_ref,   # f32[19]: origin 0:3, lower_left 3:6, horizontal 6:9,
               #          vertical 9:12, u 12:15, v 15:18, lens_radius 18
    meta_ref,  # u32[2]: k0, k1 (replicated/unvarying under shard_map)
    # VMEM
    pix_ref,   # (n_banks, 8, 128) u32 — global pixel id per lane bank
    soff_ref,  # (8,128) u32 — sample-id offset (broadcast; may be
               # samples-axis-varying under shard_map, hence VMEM not SMEM)
    xf_ref,    # (n_banks, 8, 128) f32 — pixel x coordinate
    yf_ref,    # (n_banks, 8, 128) f32 — pixel y coordinate
    # outputs
    out_r, out_g, out_b,  # (n_banks, 8, 128) f32 radiance sums
    out_n,                # (n_banks, 8, 128) f32 iteration counts
    *, n_spheres: int, n_samples: int, max_depth: int, n_banks: int,
    width: int, height: int, t_min: float, t_max: float,
    rr_start_depth: int = 0, use_plane: bool = False,
):
    f32 = jnp.float32
    shape = (_SUB, _LANE)
    k0, k1 = meta_ref[0], meta_ref[1]
    samp_off = soff_ref[:]

    tables = (
        cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
        albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    )

    nsamp_u = jnp.uint32(n_samples)
    nbank_u = jnp.uint32(n_banks)

    # Outputs are accumulated by in-loop read-modify-write at bank
    # transitions; zero them before the loop.
    zero = jnp.zeros(shape, f32)
    for k in range(n_banks):
        out_r[k] = zero
        out_g[k] = zero
        out_b[k] = zero
        out_n[k] = zero

    # Carry: kb, s, pix, alive_f, ox oy oz dx dy dz tr tg tb,
    #        acc_r acc_g acc_b (ONE accumulator — the current bank's), b.
    # Keeping a single accumulator and flushing it to out[kb] when the
    # lane's bank completes costs ~9*n_banks VMEM ops per iteration but
    # frees 3*(n_banks-1) carried registers, which is what allows raising
    # n_banks beyond 8 — per-lane workload variance (the block-straggler
    # tail) shrinks as 1/sqrt(n_banks).
    def cond(carry):
        return jnp.any(carry[0] < nbank_u)

    def body(carry):
        (kb, s, pix, alive_f,
         ox, oy, oz, dx, dy, dz, tr, tg, tb,
         acr, acg, acb, itc, b) = carry
        alive = alive_f > 0.0

        def uniforms(c1):
            w0, w1 = threefry2x32(k0, k1, pix, c1)
            return to_unit_float(w0), to_unit_float(w1)

        # ---- regenerate on exhausted lanes (possibly a new bank) --------
        regen = (~alive) & (kb < nbank_u)
        # Bank-select the pixel attributes for regenerating lanes.
        npix, nxf, nyf = pix_ref[0], xf_ref[0], yf_ref[0]
        for k in range(1, n_banks):
            in_k = kb == jnp.uint32(k)
            npix = jnp.where(in_k, pix_ref[k], npix)
            nxf = jnp.where(in_k, xf_ref[k], nxf)
            nyf = jnp.where(in_k, yf_ref[k], nyf)
        pix = jnp.where(regen, npix, pix)

        sample_id = samp_off + s
        c1b = sample_id << jnp.uint32(8)
        jx, jy = uniforms(c1b | jnp.uint32(124))
        lu, lv = uniforms(c1b | jnp.uint32(125))
        # Camera ray built from the bank-selected coordinates: it is only
        # consumed under the regen mask, so no xf/yf carry is needed.
        nox, noy, noz, ndx, ndy, ndz = camera_ray_tiles(
            cam_ref, nxf, nyf, jx, jy, lu, lv, width=width, height=height
        )
        ox = jnp.where(regen, nox, ox)
        oy = jnp.where(regen, noy, oy)
        oz = jnp.where(regen, noz, oz)
        dx = jnp.where(regen, ndx, dx)
        dy = jnp.where(regen, ndy, dy)
        dz = jnp.where(regen, ndz, dz)
        tr = jnp.where(regen, 1.0, tr)
        tg = jnp.where(regen, 1.0, tg)
        tb = jnp.where(regen, 1.0, tb)
        b = jnp.where(regen, jnp.uint32(0), b)
        alive = alive | regen
        # Per-bank iteration counter: the per-pixel cost signal that drives
        # the adaptive lane rebalancing (render.accumulate probe pass).
        itc = itc + jnp.where(alive, 1.0, 0.0)

        # ---- closest hit + reconstruction (shared tile physics) ---------
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

        # ---- bounce noise (7 uniforms, slot map of ops/sampling.py) -----
        slot0 = b * jnp.uint32(4)
        u0, u1 = uniforms(c1b | (slot0 + jnp.uint32(0)))
        u2, u3 = uniforms(c1b | (slot0 + jnp.uint32(1)))
        u4, u5 = uniforms(c1b | (slot0 + jnp.uint32(2)))

        # ---- sky miss shader into the lane accumulator ------------------
        skr, skg, skb = sky_components(sky_ref, dy)
        miss_f = jnp.where(alive & ~hit, 1.0, 0.0)
        acr = acr + tr * skr * miss_f
        acg = acg + tg * skg * miss_f
        acb = acb + tb * skb * miss_f

        sdx, sdy, sdz, atr, atg, atb, scattered = scatter_tiles(
            dx, dy, dz, nx, ny, nz, mat, ar, ag, ab, fz, io,
            (u0, u1, u2, u3, u4, u5),
        )

        # ---- state update + sample/bank advance -------------------------
        b_next = b + jnp.uint32(1)
        surv = alive & hit & scattered & (b_next < jnp.uint32(max_depth))
        lf = jnp.where(alive & hit, 1.0, 0.0)
        tr = tr * jnp.where(surv, atr, 1.0)
        tg = tg * jnp.where(surv, atg, 1.0)
        tb = tb * jnp.where(surv, atb, 1.0)
        if rr_start_depth:
            # Russian roulette (matches the jnp bounce: same u6 column).
            q = jnp.clip(jnp.maximum(jnp.maximum(tr, tg), tb), 0.05, 1.0)
            u6, _ = uniforms(c1b | (slot0 + jnp.uint32(3)))
            do_rr = b >= jnp.uint32(rr_start_depth)
            surv = surv & ~(do_rr & (u6 >= q))
            boost = jnp.where(do_rr & surv, 1.0 / q, 1.0)
            tr = tr * boost
            tg = tg * boost
            tb = tb * boost
        terminated = alive & ~surv
        sf = jnp.where(surv, 1.0, 0.0)
        ox = ox + (px - ox) * lf
        oy = oy + (py - oy) * lf
        oz = oz + (pz - oz) * lf
        dx = dx + (sdx - dx) * sf
        dy = dy + (sdy - dy) * sf
        dz = dz + (sdz - dz) * sf
        b = jnp.where(surv, b_next, b)
        s_next = s + jnp.uint32(1)
        bank_done = s_next >= nsamp_u
        flush = terminated & bank_done
        flush_f = jnp.where(flush, 1.0, 0.0)
        for k in range(n_banks):
            mk = flush_f * jnp.where(kb == jnp.uint32(k), 1.0, 0.0)
            out_r[k] = out_r[k] + acr * mk
            out_g[k] = out_g[k] + acg * mk
            out_b[k] = out_b[k] + acb * mk
            out_n[k] = out_n[k] + itc * mk
        keep = 1.0 - flush_f
        acr = acr * keep
        acg = acg * keep
        acb = acb * keep
        itc = itc * keep
        s = jnp.where(terminated, jnp.where(bank_done, jnp.uint32(0), s_next), s)
        kb = jnp.where(flush, kb + jnp.uint32(1), kb)
        return (kb, s, pix, sf, ox, oy, oz, dx, dy, dz, tr, tg, tb,
                acr, acg, acb, itc, b)

    z = jnp.zeros(shape, f32)
    zu = jnp.zeros(shape, jnp.uint32)
    one = jnp.ones(shape, f32)
    carry = (zu, zu, zu, z,
             z, z, z, z, z, one,
             one, one, one,
             z, z, z, z, zu)
    jax.lax.while_loop(cond, body, carry)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_samples", "max_depth", "width", "height", "t_min", "t_max",
        "rr_start_depth", "interpret", "n_banks", "return_counts",
    ),
)
def render_block_persistent(
    pixel_ids, scene_tables, sky6, cam19, key2, sample_offset,
    n_samples, max_depth, width, height,
    t_min=1e-3, t_max=3.0e7, rr_start_depth=0, interpret=False, n_banks=None,
    return_counts=False, plane7=None,
):
    """Radiance SUM over n_samples for each pixel id. Returns [P, 3] f32.
    With ``return_counts=True`` returns ([P, 3] radiance, [P] f32 kernel
    iterations spent on that pixel's n_samples — the per-pixel cost signal
    for adaptive lane balancing).

    pixel_ids: [P] int/uint — global pixel ids (row-major, y*width+x).
    scene_tables: 11 [S] arrays (see pallas_bounce.bounce_step_pallas).
    cam19: f32[19] camera constants (see _persistent_kernel).
    key2: u32[2] cipher key.  sample_offset: scalar u32 (may be
    samples-axis-varying under shard_map).

    Load balance: each lane serves n_banks pixels strided n_lanes apart in
    the pixel_ids array, so a lane's total work averages over widely
    separated pixels.  Without banking, a block's while_loop runs as long
    as its WORST pixel (a glass pixel can cost ~3x the mean), idling the
    other 1023 lanes — measured ~2.2x waste on the cover scene.
    """
    p = pixel_ids.shape[0]
    if n_banks is None:
        # Single-accumulator flushing (see _persistent_kernel) makes banks
        # cheap: 16 measured best on v5e (straggler tail ~1/sqrt(banks)
        # vs ~9*n_banks extra VMEM ops/iteration).
        n_banks = DEFAULT_BANKS
    # Shared banked layout (pallas_common.banked_lane_layout) — the SAME
    # position->(bank, lane) map the regen gradient kernels use.
    n_banks, n_lanes, rows, pix, xf, yf, unbank = banked_lane_layout(
        pixel_ids, width, n_banks
    )
    soff = jnp.full((rows, _LANE), jnp.asarray(sample_offset, jnp.uint32))

    use_plane = plane7 is not None
    if plane7 is None:
        plane7 = jnp.zeros((7,), jnp.float32)
    scene_tables = pad_scene_tables(scene_tables)
    s = scene_tables[0].shape[0]
    kernel = functools.partial(
        _persistent_kernel,
        n_spheres=s, n_samples=int(n_samples), max_depth=int(max_depth),
        n_banks=n_banks, width=int(width), height=int(height),
        t_min=float(t_min), t_max=float(t_max),
        rr_start_depth=int(rr_start_depth), use_plane=use_plane,
    )
    blk2 = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec(
        (n_banks, _SUB, _LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # Under shard_map outputs must declare their varying mesh axes (vma):
    # inherit the union from the inputs.
    vma = vma_union(pixel_ids, key2, sample_offset, *scene_tables, plane7)

    def to_vma(x):
        missing = vma - getattr(jax.typeof(x), "vma", frozenset())
        return jax.lax.pcast(x, tuple(missing), to="varying") if missing else x

    if vma:
        pix, soff, xf, yf = (to_vma(x) for x in (pix, soff, xf, yf))
    out_r, out_g, out_b, out_n = pl.pallas_call(
        kernel,
        grid=(rows // _SUB,),
        in_specs=[smem] * 15 + [blk3, blk2, blk3, blk3],
        out_specs=(blk3, blk3, blk3, blk3),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_banks, rows, _LANE), jnp.float32, vma=vma)
            for _ in range(4)
        ),
        cost_estimate=pl.CostEstimate(
            flops=40 * rows * _LANE * n_banks * s * int(n_samples),
            bytes_accessed=16 * rows * _LANE * n_banks,
            transcendentals=16 * rows * _LANE * n_banks * int(n_samples),
        ),
        interpret=interpret,
    )(*scene_tables, sky6, plane7, cam19, jnp.asarray(key2, jnp.uint32),
      pix, soff, xf, yf)
    img = jnp.stack([unbank(out_r), unbank(out_g), unbank(out_b)], axis=-1)
    if return_counts:
        return img, unbank(out_n)
    return img


def camera_constants(cam, width, height):
    """Precompute the f32[19] SMEM camera block from a Camera pytree.

    Mirrors camera.generate_rays (same basis math) so the in-kernel ray
    generation is bit-compatible with the jnp path.
    """
    from ..camera import camera_basis

    u, v, w = camera_basis(cam)
    aspect = width / height
    half_h = jnp.tan(jnp.deg2rad(cam.vfov_deg) * 0.5)
    half_w = aspect * half_h
    fd = cam.focus_dist
    lower_left = cam.origin - fd * (half_w * u + half_h * v + w)
    horizontal = 2.0 * half_w * fd * u
    vertical = 2.0 * half_h * fd * v
    lens = 0.5 * cam.aperture
    return jnp.concatenate([
        cam.origin, lower_left, horizontal, vertical, u, v,
        jnp.reshape(lens, (1,)),
    ]).astype(jnp.float32)
