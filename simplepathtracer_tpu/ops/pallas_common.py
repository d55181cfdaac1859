"""Shared tile-level building blocks for the Pallas kernels.

Both TPU kernels — the per-bounce megakernel (pallas_bounce.py) and the
persistent whole-render kernel (pallas_persistent.py) — run the same
physics on (8, 128) f32 tiles: counter-based threefry RNG, the unrolled
sphere scan with inline winner-attribute tracking, hit reconstruction, the
sky gradient, and the Lambertian/metal/dielectric scatter.  This module is
the single home for that math so the two kernels cannot drift apart (their
agreement with the jnp reference path is tested; their agreement with each
other follows from sharing this code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from ..types import Material

SUB = 8
LANE = 128
BLOCK = SUB * LANE

# threefry2x32 constants (must match ops/sampling.py).
_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)


def _rotl(x, r: int):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(k0, k1, c0, c1):
    """20-round threefry2x32 on u32 tiles — identical to ops/sampling.py."""
    ks2 = k0 ^ k1 ^ _PARITY
    x0 = c0 + k0
    x1 = c1 + k1

    def four(x0, x1, rs):
        for r in rs:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x1 ^ x0
        return x0, x1

    x0, x1 = four(x0, x1, _ROT[:4])
    x0, x1 = x0 + k1, x1 + ks2 + jnp.uint32(1)
    x0, x1 = four(x0, x1, _ROT[4:])
    x0, x1 = x0 + ks2, x1 + k0 + jnp.uint32(2)
    x0, x1 = four(x0, x1, _ROT[:4])
    x0, x1 = x0 + k0, x1 + k1 + jnp.uint32(3)
    x0, x1 = four(x0, x1, _ROT[4:])
    x0, x1 = x0 + k1, x1 + ks2 + jnp.uint32(4)
    x0, x1 = four(x0, x1, _ROT[:4])
    x0, x1 = x0 + ks2, x1 + k0 + jnp.uint32(5)
    return x0, x1


def to_unit_float(bits):
    """u32 -> f32 in [0, 1) from the top 24 bits.

    Mosaic has no u32 -> f32 cast; the 24-bit value fits in i32, so a
    bitcast (exact, non-negative) then i32 -> f32 is equivalent.
    """
    i = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return i.astype(jnp.float32) * np.float32(2.0**-24)


def vma_union(*arrays):
    """Union of the varying-mesh-axes sets of all arguments.

    Under shard_map, pallas_call outputs must declare their vma; every
    kernel wrapper takes the union of its inputs'.  The getattr hedge
    covers jax versions where jax.typeof has no vma field.
    """
    vma = frozenset()
    for a in arrays:
        vma |= getattr(jax.typeof(a), "vma", frozenset())
    return vma


def pad_scene_tables(tables, multiple: int = 16):
    """Pad the 11 SMEM sphere tables to a multiple of ``multiple`` slots.

    The sphere scan's manual unroll needs n_spheres % unroll == 0; on v5e
    the measured ladder is 4x -> 8x (+7.5%) -> 16x (+6%) -> 32x (slight
    regression), so 16 is the default (deeper unroll overlaps scalar SMEM
    loads with VPU work and lengthens independent chains).  Padding slots
    use r^2 = -1: disc = r2 - |oc_perp|^2 <= -1 for EVERY ray, so sqrt
    yields NaN and the candidate self-rejects — no cancellation edge case
    (padding with huge centers risks disc ~ 0 through inf-inf).
    """
    s = tables[0].shape[0]
    pad = (-s) % multiple
    if pad == 0:
        return tables
    out = []
    for i, t in enumerate(tables):
        if i in (3, 4):  # radius / r2 slots
            # NaN radius: the scan recomputes r^2 = r*r in-kernel, so the
            # padding discriminant is NaN for every ray and self-rejects
            # (r2 = -1 kept for the slot-4 sentinel description above).
            fill = jnp.full((pad,), jnp.nan if i == 3 else -1.0, t.dtype)
        else:
            fill = jnp.zeros((pad,), t.dtype)
        out.append(jnp.concatenate([t, fill]))
    return tuple(out)


def closest_hit_scan(
    table_refs, ox, oy, oz, dx, dy, dz, *, n_spheres: int, t_min: float, t_max: float
):
    """Unrolled linear scan over the SMEM sphere tables with inline
    winner-attribute tracking.

    table_refs: (cx, cy, cz, radius, r2, albr, albg, albb, mat, fuzz, ior)
    SMEM refs.  Returns (t, index, cx, cy, cz, r, albr, albg, albb, mat,
    fuzz, ior) tiles for the winning sphere (index == -1 for miss).

    Candidates with a negative discriminant self-reject through IEEE NaN
    (sqrt of a negative fails every comparison).  The manual unroll lets
    the scalar table loads run ahead of the VPU pipeline — measured 2.2x
    on v5e; lax.fori_loop(unroll=) only supports full unrolling.
    """
    cx_ref, cy_ref, cz_ref, rad_ref, r2_ref, ar_ref, ag_ref, ab_ref, m_ref, f_ref, i_ref = table_refs
    shape = (SUB, LANE)
    f32 = jnp.float32
    init = (
        jnp.full(shape, t_max, f32), jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, f32), jnp.zeros(shape, f32), jnp.zeros(shape, f32),
        jnp.ones(shape, f32), jnp.zeros(shape, f32), jnp.zeros(shape, f32),
        jnp.zeros(shape, f32), jnp.zeros(shape, jnp.int32),
        jnp.zeros(shape, f32), jnp.ones(shape, f32),
    )

    def one_sphere(s, c):
        (bt, bi, bcx, bcy, bcz, br, bar, bag, bab, bm, bf, bio) = c
        scx, scy, scz = cx_ref[s], cy_ref[s], cz_ref[s]
        # r^2 recomputed from the radius (1 scalar mult) instead of loaded
        # (measured perf-neutral — the scan is VPU-issue-bound, not
        # load-bound — but it drops one SMEM table dependency).  Padding
        # slots carry radius NaN, so disc = NaN^2 - ... self-rejects
        # exactly like the old r2 = -1 sentinel.
        sr = rad_ref[s]
        sr2 = sr * sr
        ocx = scx - ox
        ocy = scy - oy
        ocz = scz - oz
        tc = ocx * dx + ocy * dy + ocz * dz
        oc2 = ocx * ocx + ocy * ocy + ocz * ocz
        disc = sr2 - (oc2 - tc * tc)
        sq = jnp.sqrt(disc)
        t_near = tc - sq
        t = jnp.where(t_near > t_min, t_near, tc + sq)
        ok = (t > t_min) & (t < bt)
        bt = jnp.where(ok, t, bt)
        bi = jnp.where(ok, s, bi)
        bcx = jnp.where(ok, scx, bcx)
        bcy = jnp.where(ok, scy, bcy)
        bcz = jnp.where(ok, scz, bcz)
        br = jnp.where(ok, sr, br)
        bar = jnp.where(ok, ar_ref[s], bar)
        bag = jnp.where(ok, ag_ref[s], bag)
        bab = jnp.where(ok, ab_ref[s], bab)
        bm = jnp.where(ok, m_ref[s], bm)
        bf = jnp.where(ok, f_ref[s], bf)
        bio = jnp.where(ok, i_ref[s], bio)
        return (bt, bi, bcx, bcy, bcz, br, bar, bag, bab, bm, bf, bio)

    unroll = next((u for u in (16, 8, 4, 2, 1) if n_spheres % u == 0), 1)

    def body(i, c):
        for u in range(unroll):
            c = one_sphere(i * unroll + u, c)
        return c

    return jax.lax.fori_loop(0, n_spheres // unroll, body, init)


def silhouette_logit_tile(u):
    """Acceptance-coin logit on tiles — identical formula to
    ops/intersect.silhouette_logit (log only; Mosaic has no log1p)."""
    tiny = np.float32(1e-30)
    return jnp.clip(
        jnp.log(jnp.maximum(u, tiny)) - jnp.log(jnp.maximum(1.0 - u, tiny)),
        -30.0, 30.0,
    )


def soft_scan_tables(tables, softness: float):
    """[4 * S_pad] f32 SMEM block for the soft scan, XLA-computed so the
    thresholds are numerically identical to the jnp path's:
      row 0  silhouette band scale (intersect.silhouette_scale)
      row 1  1 / r^2 (blocker-score normalizer)
      row 2  validity band scale sigma_v (intersect.validity_scale)
      row 3  t_min-side blocker-candidacy floor minus t_min
             (-30 sigma_v; added to t_min in-kernel)
    Padding slots carry NaN radius -> NaN entries -> every comparison
    self-rejects."""
    from .intersect import silhouette_scale, validity_scale

    rad = tables[3]
    sigv = validity_scale(softness, rad)
    return jnp.concatenate(
        [silhouette_scale(softness, rad), 1.0 / (rad * rad),
         sigv, -30.0 * sigv]
    ).astype(jnp.float32)


def closest_hit_scan_soft(
    table_refs, ox, oy, oz, dx, dy, dz, u_coin, uv_coin, prev, sil_ref,
    *, n_spheres: int, t_min: float, t_max: float, softness: float,
):
    """Stochastic-transparency closest hit: the soft-silhouette scan
    (round 5), one-pass semantics identical to ops/intersect
    .intersect_scene_soft.

    Sphere s is accepted iff disc_s > logit(u) * softness * r_s^2 (i.e.
    sigmoid(disc/(soft r^2)) > u with one shared coin per ray per bounce)
    AND t_raw beats the VALIDITY coin t_min + logit(uv) * sigma_v(r_s)
    (round 5 — the smoothed candidate gate; the realized t clamps to
    t_min).  ``prev`` (i32 tile, -1 = none) is the chain's previous sphere
    winner: it keeps the HARD t > t_min gate so its own exactly-zero far
    root cannot be coin-revalidated as an in-place self-hit.  The winner is
    the nearest accepted sphere — possibly a grazing phantom (disc < 0,
    t ~ t_center via the clamped sqrt).  Additionally tracks the strongest
    sphere REJECTED BY EITHER COIN whose would-be (clamped) hit t beats
    the running best (exclusive) and whose t_raw is above the validity
    floor t_min - 30 sigma_v: the blocker, whose probabilities enter the
    bounce's detached ratio.  Padding slots self-reject through NaN radius
    in every branch (NaN compares false).

    Returns (winner 12-tuple like closest_hit_scan) + (bidx, bcx, bcy,
    bcz, brr) blocker tiles (bidx == -1: none).
    """
    cx_ref, cy_ref, cz_ref, rad_ref, r2_ref, ar_ref, ag_ref, ab_ref, m_ref, f_ref, i_ref = table_refs
    shape = (SUB, LANE)
    f32 = jnp.float32
    lgt = silhouette_logit_tile(u_coin)
    lgtv = silhouette_logit_tile(uv_coin)
    init = (
        jnp.full(shape, t_max, f32), jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, f32), jnp.zeros(shape, f32), jnp.zeros(shape, f32),
        jnp.ones(shape, f32), jnp.zeros(shape, f32), jnp.zeros(shape, f32),
        jnp.zeros(shape, f32), jnp.zeros(shape, jnp.int32),
        jnp.zeros(shape, f32), jnp.ones(shape, f32),
        # blocker: idx, cx, cy, cz, r, score
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, f32), jnp.zeros(shape, f32), jnp.zeros(shape, f32),
        jnp.zeros(shape, f32), jnp.full(shape, -jnp.inf, f32),
    )

    def one_sphere(s, c):
        (bt, bi, bcx, bcy, bcz, br, bar, bag, bab, bm, bf, bio,
         qi, qx, qy, qz, qr, qs) = c
        scx, scy, scz = cx_ref[s], cy_ref[s], cz_ref[s]
        sr = rad_ref[s]
        sr2 = sr * sr
        ocx = scx - ox
        ocy = scy - oy
        ocz = scz - oz
        tc = ocx * dx + ocy * dy + ocz * dz
        oc2 = ocx * ocx + ocy * ocy + ocz * ocz
        disc = sr2 - (oc2 - tc * tc)
        sq = jnp.sqrt(jnp.maximum(disc, np.float32(1e-12)))
        t_near = tc - sq
        t_raw = jnp.where(t_near > t_min, t_near, tc + sq)
        t = jnp.maximum(t_raw, t_min)       # realized-t clamp (validity coin)
        is_prev = prev == s
        thr_v = jnp.where(is_prev, 0.0, lgtv * sil_ref[2 * n_spheres + s])
        gate_lo = jnp.where(is_prev, 0.0, sil_ref[3 * n_spheres + s])
        valc = (t_raw > t_min + thr_v) & (t_raw < t_max)
        in_front = t < bt                   # exclusive running best
        accept = (disc > lgt * sil_ref[s]) & valc
        # Blocker first (uses the PRE-update running best t).
        score = disc * sil_ref[n_spheres + s]
        qok = (
            (~accept) & (t_raw > t_min + gate_lo) & in_front & (score > qs)
        )
        qi = jnp.where(qok, s, qi)
        qx = jnp.where(qok, scx, qx)
        qy = jnp.where(qok, scy, qy)
        qz = jnp.where(qok, scz, qz)
        qr = jnp.where(qok, sr, qr)
        qs = jnp.where(qok, score, qs)
        ok = accept & in_front
        bt = jnp.where(ok, t, bt)
        bi = jnp.where(ok, s, bi)
        bcx = jnp.where(ok, scx, bcx)
        bcy = jnp.where(ok, scy, bcy)
        bcz = jnp.where(ok, scz, bcz)
        br = jnp.where(ok, sr, br)
        bar = jnp.where(ok, ar_ref[s], bar)
        bag = jnp.where(ok, ag_ref[s], bag)
        bab = jnp.where(ok, ab_ref[s], bab)
        bm = jnp.where(ok, m_ref[s], bm)
        bf = jnp.where(ok, f_ref[s], bf)
        bio = jnp.where(ok, i_ref[s], bio)
        return (bt, bi, bcx, bcy, bcz, br, bar, bag, bab, bm, bf, bio,
                qi, qx, qy, qz, qr, qs)

    unroll = next((u for u in (16, 8, 4, 2, 1) if n_spheres % u == 0), 1)

    def body(i, c):
        for k in range(unroll):
            c = one_sphere(i * unroll + k, c)
        return c

    out = jax.lax.fori_loop(0, n_spheres // unroll, body, init)
    return out[:12], out[12:17]


def banked_lane_layout(pixel_ids, width, n_banks):
    """The banked pixel->lane layout shared by the persistent forward
    kernel and the regeneration gradient kernels.

    Bank k, lane l serves position k*n_lanes + l of ``pixel_ids`` (strided
    banks: a lane's pixels are widely separated, averaging per-lane work).
    Overflow positions clamp to the last pixel — they re-trace a real
    pixel and are discarded by ``unbank``'s slice, whose autodiff
    transpose zero-fills their cotangents (load-bearing for the gradient
    kernels' duplicate-chain argument).

    Returns (n_banks, n_lanes, rows, pix, xf, yf, unbank) with
    pix/xf/yf shaped (n_banks, rows, 128) and ``unbank`` mapping a
    (n_banks, rows, 128) output back to a [P]-vector.
    """
    p = pixel_ids.shape[0]
    n_banks = int(min(n_banks, max(1, p // BLOCK)))
    n_lanes = -(-p // n_banks)
    lanes_pad = -(-n_lanes // BLOCK) * BLOCK
    rows = lanes_pad // LANE
    pix_all = jnp.asarray(pixel_ids).astype(jnp.uint32)
    pos = (
        jnp.arange(n_banks, dtype=jnp.int32)[:, None] * n_lanes
        + jnp.arange(lanes_pad, dtype=jnp.int32)[None, :]
    )
    pos = jnp.minimum(pos, p - 1)
    pix = pix_all[pos]                                   # [n_banks, lanes_pad]
    xf = (pix % jnp.uint32(width)).astype(jnp.float32)
    yf = (pix // jnp.uint32(width)).astype(jnp.float32)

    def unbank(o):
        return o.reshape(n_banks, lanes_pad)[:, :n_lanes].reshape(-1)[:p]

    return (
        n_banks, n_lanes, rows,
        pix.reshape(n_banks, rows, LANE),
        xf.reshape(n_banks, rows, LANE),
        yf.reshape(n_banks, rows, LANE),
        unbank,
    )


def plane_override(plane_ref, winner, ox, oy, oz, dx, dy, dz, *, t_min: float,
                   hit_code: int = 1 << 20, encode_params: bool = False,
                   thr_x=None, t_max: float = 3.0e7):
    """Merge an optional Lambertian ground plane into the scan winner.

    ``plane_ref``: f32[7] SMEM (unit normal xyz, offset k, albedo rgb) —
    scenes.with_ground_plane layout; ``winner``: the closest_hit_scan
    result tuple (t, index, cx, cy, cz, r, albr, albg, albb, mat, fuzz,
    ior).  Where the plane hit is nearer, the winner becomes a VIRTUAL UNIT
    SPHERE tangent at the hit point (center = point - face_normal, r = 1),
    so the downstream hit_point_normal recovers exactly the face-forward
    plane normal with zero extra kernel code; attributes become the plane's
    (Lambertian, fuzz 0).  index is set to ``hit_code`` (default
    1<<20) — any non-negative value reads as "hit"; the forward kernels
    never index tables with it, and the regen gradient kernels pass their
    10-bit-packable plane code (pallas_grad_regen.PLANE_IDX) so the bucket
    one-hot skips plane lanes and the streamed replay can recompute the
    virtual winner.  Costs ~one sphere of
    VPU work per iteration and is only EMITTED when the scene has a plane
    (static use_plane flags in the kernel wrappers).

    ``thr_x``: None (hard nearest-wins select), or the crossing-coin
    threshold tile ``logit(ux) * sigma_x(r_winner)`` (round 5): the sphere
    winner beats the plane iff ``t_sphere < t_plane + thr_x`` — the
    stochastic WINNER SELECT whose probability the bounce's detached ratio
    differentiates (opaque-opaque intersection edges; formula shared with
    render.py's jnp branch, knife-edge coins must agree bit-for-bit).

    Reference counterpart: the dead RayPlaneIntersection/
    CalculateRayPlaneContactPoint (include/Collision.hpp:73-85), live here.
    """
    (bt, bi, bcx, bcy, bcz, br, bar, bag, bab, bm, bf, bio) = winner
    pnx, pny, pnz, pk = plane_ref[0], plane_ref[1], plane_ref[2], plane_ref[3]
    denom = dx * pnx + dy * pny + dz * pnz
    num = -(ox * pnx + oy * pny + oz * pnz + pk)
    live = jnp.abs(denom) > 1e-8
    tp = num / jnp.where(live, denom, 1.0)
    if thr_x is None:
        wins = live & (tp > t_min) & (tp < bt)
    else:
        # Stochastic plane-vs-sphere select: plane wins unless a sphere
        # winner exists AND beats it through the coin.  Op order and the
        # validity gates match render.py / ops/plane.ray_plane_intersection
        # (``hit.t < ph.t + thr_x``; knife-edge coins must agree).
        wins = (
            live & (tp > t_min) & (tp < t_max)
            & ~((bi >= 0) & (bt < tp + thr_x))
        )
    # Face-forward side: the normal opposing the incoming ray.
    sgn = jnp.where(denom > 0.0, -1.0, 1.0)
    px = ox + tp * dx
    py = oy + tp * dy
    pz = oz + tp * dz
    bt = jnp.where(wins, tp, bt)
    bi = jnp.where(wins, hit_code, bi)
    if encode_params:
        # Gradient-kernel encoding: (cx, cy, cz) = raw unit normal, r =
        # offset k — bounce_tile(plane_mask=...) computes the true plane t
        # from these (well-conditioned at grazing incidence; the virtual
        # sphere's tc - sqrt(disc) recompute cancels catastrophically
        # there) and the offset cotangent rides the ordinary r-slot vjp.
        bcx = jnp.where(wins, pnx, bcx)
        bcy = jnp.where(wins, pny, bcy)
        bcz = jnp.where(wins, pnz, bcz)
        br = jnp.where(wins, pk, br)
    else:
        bcx = jnp.where(wins, px - sgn * pnx, bcx)
        bcy = jnp.where(wins, py - sgn * pny, bcy)
        bcz = jnp.where(wins, pz - sgn * pnz, bcz)
        br = jnp.where(wins, 1.0, br)
    bar = jnp.where(wins, plane_ref[4], bar)
    bag = jnp.where(wins, plane_ref[5], bag)
    bab = jnp.where(wins, plane_ref[6], bab)
    bm = jnp.where(wins, int(Material.LAMBERTIAN), bm)
    bf = jnp.where(wins, 0.0, bf)
    bio = jnp.where(wins, 1.0, bio)
    merged = (bt, bi, bcx, bcy, bcz, br, bar, bag, bab, bm, bf, bio)
    if thr_x is not None:
        # Stochastic mode: the caller also needs the realized select and
        # the plane t (to stash the crossing LOSER in the blocker slot).
        return merged, wins, tp
    return merged


def camera_ray_tiles(cam_ref, xf, yf, jx, jy, lu, lv, *, width: int, height: int):
    """Thin-lens camera ray on tiles from pixel coords + 4 uniforms.

    ``cam_ref``: the f32[19] SMEM block from pallas_persistent.camera_constants
    (origin 0:3, lower_left 3:6, horizontal 6:9, vertical 9:12, u 12:15,
    v 15:18, lens_radius 18).  Same math as camera.generate_rays — the
    single in-kernel source shared by the persistent and raygen kernels.
    Returns (ox, oy, oz, dx, dy, dz) with unit directions.
    """
    s01 = (xf + jx) * np.float32(1.0 / width)
    t01 = 1.0 - (yf + jy) * np.float32(1.0 / height)
    lr = jnp.sqrt(lu) * cam_ref[18]
    th = np.float32(2.0 * np.pi) * lv
    ou = lr * jnp.cos(th)
    ov = lr * jnp.sin(th)
    ox = cam_ref[0] + ou * cam_ref[12] + ov * cam_ref[15]
    oy = cam_ref[1] + ou * cam_ref[13] + ov * cam_ref[16]
    oz = cam_ref[2] + ou * cam_ref[14] + ov * cam_ref[17]
    dx = cam_ref[3] + s01 * cam_ref[6] + t01 * cam_ref[9] - ox
    dy = cam_ref[4] + s01 * cam_ref[7] + t01 * cam_ref[10] - oy
    dz = cam_ref[5] + s01 * cam_ref[8] + t01 * cam_ref[11] - oz
    ninv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-20)
    return ox, oy, oz, dx * ninv, dy * ninv, dz * ninv


def hit_point_normal(ox, oy, oz, dx, dy, dz, t, cx, cy, cz, r):
    """Hit point + outward unit normal; the sign of r flips the normal for
    Shirley's hollow glass (negative radii)."""
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    nx = (px - cx) / r
    ny = (py - cy) / r
    nz = (pz - cz) / r
    inv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
    return px, py, pz, nx * inv, ny * inv, nz * inv


def sky_components(sky_ref, dy):
    """Vertical sky gradient rgb from the f32[6] (lo rgb, hi rgb) SMEM ref."""
    s01 = 0.5 * (dy + 1.0)
    return (
        sky_ref[0] + (sky_ref[3] - sky_ref[0]) * s01,
        sky_ref[1] + (sky_ref[4] - sky_ref[1]) * s01,
        sky_ref[2] + (sky_ref[5] - sky_ref[2]) * s01,
    )


def scatter_tiles(dx, dy, dz, nx, ny, nz, mat, ar, ag, ab, fz, io, u,
                  fresnel_score=False):
    """Branchless Lambertian/metal/dielectric scatter on tiles.

    u: 6 uniform tiles (bounce_noise columns 0-5).  Returns
    (sdx, sdy, sdz, atr, atg, atb, scattered) — the scattered unit
    direction, rgb attenuation, and the metal-absorption mask.  Semantics
    identical to ops/materials.scatter (the jnp reference), including the
    detached Schlick-coin probability ratio under ``fresnel_score`` (soft
    configs; see scatter_attrs).
    """
    d_dot_n = dx * nx + dy * ny + dz * nz
    front = d_dot_n < 0.0
    fsign = jnp.where(front, 1.0, -1.0)
    nfx, nfy, nfz = nx * fsign, ny * fsign, nz * fsign
    cos_t = jnp.minimum(-(dx * nfx + dy * nfy + dz * nfz), 1.0)

    # Lambertian: nf + uniform point on the unit sphere.
    zl = 1.0 - 2.0 * u[0]
    rl = jnp.sqrt(jnp.maximum(1.0 - zl * zl, 0.0))
    phl = np.float32(2.0 * np.pi) * u[1]
    lx = nfx + rl * jnp.cos(phl)
    ly = nfy + rl * jnp.sin(phl)
    lz = nfz + zl
    ln2 = lx * lx + ly * ly + lz * lz
    linv = jax.lax.rsqrt(jnp.maximum(ln2, 1e-20))
    ldeg = ln2 <= 1e-12
    lamx = jnp.where(ldeg, nfx, lx * linv)
    lamy = jnp.where(ldeg, nfy, ly * linv)
    lamz = jnp.where(ldeg, nfz, lz * linv)

    # Metal: mirror + fuzz * uniform point in the unit ball.
    two_dn = 2.0 * (dx * nfx + dy * nfy + dz * nfz)
    rfx = dx - two_dn * nfx
    rfy = dy - two_dn * nfy
    rfz = dz - two_dn * nfz
    zm = 1.0 - 2.0 * u[2]
    rm = jnp.sqrt(jnp.maximum(1.0 - zm * zm, 0.0))
    phm = np.float32(2.0 * np.pi) * u[3]
    # cbrt has no Mosaic lowering; exp(log/3) is equivalent for u in [0,1).
    bscale = jnp.exp(jnp.log(jnp.maximum(u[4], 1e-30)) * np.float32(1.0 / 3.0)) * fz
    mx = rfx + bscale * rm * jnp.cos(phm)
    my = rfy + bscale * rm * jnp.sin(phm)
    mz = rfz + bscale * zm
    mn2 = mx * mx + my * my + mz * mz
    minv = jax.lax.rsqrt(jnp.maximum(mn2, 1e-20))
    mdeg = mn2 <= 1e-12
    metx = jnp.where(mdeg, nfx, mx * minv)
    mety = jnp.where(mdeg, nfy, my * minv)
    metz = jnp.where(mdeg, nfz, mz * minv)
    metal_ok = metx * nfx + mety * nfy + metz * nfz > 0.0

    # Dielectric: Schlick + sqrt-free TIR test (booleans carry no gradient
    # and sqrt'(0) would be inf at head-on hits).
    eta = jnp.where(front, 1.0 / io, io)
    sin2 = jnp.maximum(1.0 - cos_t * cos_t, 0.0)
    cannot = eta * eta * sin2 > 1.0
    r0s = (1.0 - eta) / (1.0 + eta)
    r0 = r0s * r0s
    omc = 1.0 - cos_t
    omc2 = omc * omc
    refl_p = r0 + (1.0 - r0) * omc2 * omc2 * omc
    do_refl = cannot | (u[5] < refl_p)
    ppx = eta * (dx + cos_t * nfx)
    ppy = eta * (dy + cos_t * nfy)
    ppz = eta * (dz + cos_t * nfz)
    par = jnp.sqrt(jnp.maximum(1.0 - (ppx * ppx + ppy * ppy + ppz * ppz), 1e-12))
    gx = jnp.where(do_refl, rfx, ppx - par * nfx)
    gy = jnp.where(do_refl, rfy, ppy - par * nfy)
    gz = jnp.where(do_refl, rfz, ppz - par * nfz)
    gn2 = gx * gx + gy * gy + gz * gz
    ginv = jax.lax.rsqrt(jnp.maximum(gn2, 1e-20))
    gdeg = gn2 <= 1e-12
    diex = jnp.where(gdeg, nfx, gx * ginv)
    diey = jnp.where(gdeg, nfy, gy * ginv)
    diez = jnp.where(gdeg, nfz, gz * ginv)

    is_metal = mat == int(Material.METAL)
    is_diel = mat == int(Material.DIELECTRIC)
    sdx = jnp.where(is_metal, metx, lamx)
    sdy = jnp.where(is_metal, mety, lamy)
    sdz = jnp.where(is_metal, metz, lamz)
    sdx = jnp.where(is_diel, diex, sdx)
    sdy = jnp.where(is_diel, diey, sdy)
    sdz = jnp.where(is_diel, diez, sdz)
    diel_att = 1.0
    if fresnel_score:
        # Detached Schlick-coin probability ratio — formula shared with
        # ops/materials.scatter_attrs (see there for the estimator note).
        from .intersect import SIL_P_FLOOR

        p_evt = jnp.where(
            do_refl, jnp.where(cannot, 1.0, refl_p), 1.0 - refl_p
        )
        p_evt = jnp.maximum(p_evt, np.float32(SIL_P_FLOOR))
        diel_att = p_evt / jax.lax.stop_gradient(p_evt)
    atr = jnp.where(is_diel, diel_att, ar)
    atg = jnp.where(is_diel, diel_att, ag)
    atb = jnp.where(is_diel, diel_att, ab)
    scattered = metal_ok | ~is_metal
    return sdx, sdy, sdz, atr, atg, atb, scattered
