"""Regeneration-based fused differentiable tracing: persistent-style
forward AND backward gradient kernels.

Why: the per-bounce fused path (ops/pallas_grad.py) sweeps every ray block
``max_depth`` times; a 1024-lane block skips a sweep only when ALL lanes
are dead, and on open scenes ~15 scattered survivors keep ~75% of blocks
alive to the last bounce — measured ~64% of the forward kernel time is
dead-lane work (BASELINE.md round-2 decomposition).  The forward-only
persistent kernel (ops/pallas_persistent.py) already solved this with
in-lane regeneration: when a lane's path terminates it immediately starts
the SAME pixel's next sample, so utilization tracks the mean path length
(~2.7 bounces) instead of the depth budget.  This module applies that
design to the DIFFERENTIABLE path:

  * ``_regen_fwd_kernel`` — one pallas program per 1024-lane block, with a
    sequential grid dimension over iteration CHUNKS: ray state lives in
    VMEM scratch (persists across the sequential grid on TPU), each grid
    step advances ``_CHUNK`` iterations and streams that chunk's
    per-iteration residuals to HBM (the full (B, 8, 128) residual planes
    would blow VMEM; chunking keeps the live output block at
    ``_CHUNK x 100 KB``).  Lanes serve ``n_banks`` pixels x ``n_samples``
    chains each; a fully-finished block memsets its chunk (alive=0,
    idx=-1) and skips the physics.  The static budget
    B = n_banks * n_samples * max_depth is the worst case, so every chain
    ALWAYS completes — but execution exits at the block's actual work
    (~mean path length), which is the entire win.
  * ``_regen_bwd_kernel`` — the same grid walked in REVERSE: carried
    (o, d, tp) cotangents live in scratch; per iteration it re-derives the
    bounce's adjoints by calling ``jax.vjp`` on the SAME ``bounce_tile``
    the per-bounce path differentiates (physics cannot drift), zeroes the
    carried cotangents at regeneration boundaries (a chain's camera-ray
    entry is detached), selects the radiance cotangent of the lane's
    CURRENT pixel bank, and emits per-iteration winner-attribute
    cotangents for the MXU bucket kernel.  Iterations recorded dead
    (including the unexecuted tail) pass carries through untouched.

Radiance values are bit-compatible with the other paths (same threefry
streams keyed by global (pixel, sample) ids, same shared tile physics);
per-pixel sums accumulate in ascending sample order exactly like
render_pixel_block's chunked scan.

Reference counterpart: none (the reference is not differentiable); the
regeneration idea is the TPU form of its wavefront queue refill
(include/TaskBasedPathTracer.hpp:61-79), here extended to autodiff.
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
    closest_hit_scan_soft,
    pad_scene_tables,
    plane_override,
    silhouette_logit_tile,
    soft_scan_tables,
    threefry2x32,
    to_unit_float,
    vma_union,
)
from ..types import Material
from .pallas_grad import bounce_tile

_BLOCK = _SUB * _LANE
# Iterations per sequential grid step (residual streaming).  A multiple of
# _IDX_PACK so the streamed-idx planes pack a whole number of words per
# step (9 was measured perf-neutral vs the round-3 value 8 — the per-step
# VMEM window grows 12.5%, well inside budget).
_CHUNK = 9
# Pixels per lane (chains/lane = banks * n_samples).  Swept on chip at the
# 100-spp sustained + RR row (round 4): 8/12/16 -> 24.6/25.6/24.8 Mpaths/s
# unbalanced (more banks shrink the straggler tail ~1/sqrt(chains) until
# bank-select cost wins); with cost-balanced pixel order 16 banks is best
# (26.9 vs 26.3) — the invert CLI pins that combination.
DEFAULT_BANKS = 12

# Streamed-idx plane packing: 3 winner indices per i32 word, 10 bits each
# (idx+1 in [0, s_pad]; 0 = miss/dead).  Triples the spp the streamed
# gradient path can hold idx planes for — at the 1200x800@depth-10 bench
# shape that moves the capacity wall from ~167 spp to ~500 spp, covering
# the BASELINE 500-spp north-star workload directly (render.py gate).
_IDX_PACK = 3
_IDX_BITS = 10
_IDX_MASK = (1 << _IDX_BITS) - 1
# Largest sphere count whose 16-padded table still fits a 10-bit idx+1
# with the plane code (below) reserved.
IDX_PACK_MAX_SPHERES = ((_IDX_MASK - 1) // 16) * 16
# Winner code for a ground-plane hit (pallas_common.plane_override): packs
# into 10 bits, never collides with a padded sphere slot (<= 1008), and
# matches no bucket one-hot row — plane cotangents take their own pinned
# accumulators in the backward kernel instead.
PLANE_IDX = _IDX_MASK - 1

# Residual plane order (each (B, rows, 128)):
#   0-2  entry origin   3-5  entry direction   6-8  entry throughput
#   9 alive  10 regen  11 kb  12 s  13 b      (f32/i32 masks + chain ids)
#   14 idx  15 mat                              (winner discrete)
#   16-24 winner attrs cx cy cz r ar ag ab fz io
# Soft (two-sided silhouette) configs append 5 more:
#   25 blocker idx   26-29 blocker attrs cx cy cz r
_N_RES = 25


def _n_res(softness: float) -> int:
    return _N_RES + 5 if softness > 0.0 else _N_RES


def _uniforms7_tile(k0, k1, pix, samp, b_tile):
    """Bounce uniforms with a PER-LANE bounce index tile (slot map of
    ops/sampling.py; the per-bounce kernels use a scalar bounce).  8
    columns — 7 is the soft-silhouette acceptance coin (round 5)."""
    c1b = samp << jnp.uint32(8)
    slot0 = b_tile * jnp.uint32(4)
    u = []
    for e in range(4):
        w0, w1 = threefry2x32(k0, k1, pix, c1b | (slot0 + jnp.uint32(e)))
        u.append(to_unit_float(w0))
        u.append(to_unit_float(w1))
    return tuple(u)


def _regen_fwd_kernel(
    # SMEM
    cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
    albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    sky_ref, cam_ref, meta_ref, plane_ref, sil_ref,
    # VMEM inputs
    pix_ref, xf_ref, yf_ref,      # (n_banks, 8, 128)
    soff_ref,                     # (8, 128) u32
    # outputs: radiance banks + this chunk's residual planes, then the
    # scratch refs (ray state persisting across the sequential chunk grid:
    # kb, s, b (u32), alive, o3, d3, tp3, acc3 (f32)) — both arrive
    # positionally, so they share *rest and are sliced below.
    out_r, out_g, out_b,          # (n_banks, 8, 128), pinned across chunks
    out_n,                        # (8, 128) per-lane live iterations (diag)
    *rest,
    n_spheres: int, n_banks: int, n_samples: int, max_depth: int,
    width: int, height: int, t_min: float, t_max: float,
    rr_start_depth: int, softness: float = 0.0, use_plane: bool = False,
    emit_full: bool = True,
):
    soft = softness > 0.0
    if emit_full:
        nr = _n_res(softness)
        res = rest[:nr]           # n_res x (_CHUNK, 8, 128) outputs
        scr = rest[nr:]
        idx_out = res[14]
    else:
        # Streamed-idx mode: the ONLY residuals are the packed winner-index
        # plane (and, under the soft scheme, the packed blocker-index
        # plane); the scan-free re-forward kernel regenerates the rest.
        res = None
        idx_out = rest[0]
        if soft:
            bidx_out = rest[1]
            scr = rest[2:]
        else:
            scr = rest[1:]
    (kb_s, s_s, b_s, alive_s,
     ox_s, oy_s, oz_s, dx_s, dy_s, dz_s,
     tr_s, tg_s, tb_s, acr_s, acg_s, acb_s, prev_s) = scr
    f32 = jnp.float32
    shape = (_SUB, _LANE)
    tables = (
        cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
        albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    )
    k0, k1 = meta_ref[0], meta_ref[1]
    nbank_u = jnp.uint32(n_banks)
    nsamp_u = jnp.uint32(n_samples)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        zero = jnp.zeros(shape, f32)
        for k in range(n_banks):
            out_r[k] = zero
            out_g[k] = zero
            out_b[k] = zero
        out_n[:] = zero
        kb_s[:] = jnp.zeros(shape, jnp.uint32)
        s_s[:] = jnp.zeros(shape, jnp.uint32)
        b_s[:] = jnp.zeros(shape, jnp.uint32)
        alive_s[:] = zero
        ox_s[:] = zero
        oy_s[:] = zero
        oz_s[:] = zero
        dx_s[:] = zero
        dy_s[:] = zero
        dz_s[:] = jnp.ones(shape, f32)
        tr_s[:] = jnp.ones(shape, f32)
        tg_s[:] = jnp.ones(shape, f32)
        tb_s[:] = jnp.ones(shape, f32)
        acr_s[:] = zero
        acg_s[:] = zero
        acb_s[:] = zero
        prev_s[:] = jnp.full(shape, -1, jnp.int32)

    busy = jnp.any((kb_s[:] < nbank_u) | (alive_s[:] > 0.0))

    def do_chunk():
        def body(kl, words):
            # Pack-word carry: (winner,) — plus the blocker word only under
            # the soft scheme (an always-carried dead register would cost
            # the register-pressure-bound scan).
            word = words[0]
            bword = words[1] if soft else None
            alive = alive_s[:] > 0.0
            kb = kb_s[:]
            s = s_s[:]
            b = b_s[:]
            samp = soff_ref[:] + s

            # ---- regenerate exhausted lanes (next sample / next bank) ----
            regen = (~alive) & (kb < nbank_u)
            npix, nxf, nyf = pix_ref[0], xf_ref[0], yf_ref[0]
            for k in range(1, n_banks):
                in_k = kb == jnp.uint32(k)
                npix = jnp.where(in_k, pix_ref[k], npix)
                nxf = jnp.where(in_k, xf_ref[k], nxf)
                nyf = jnp.where(in_k, yf_ref[k], nyf)
            c1b = samp << jnp.uint32(8)
            w0, w1 = threefry2x32(k0, k1, npix, c1b | jnp.uint32(124))
            jx, jy = to_unit_float(w0), to_unit_float(w1)
            w0, w1 = threefry2x32(k0, k1, npix, c1b | jnp.uint32(125))
            lu, lv = to_unit_float(w0), to_unit_float(w1)
            cox, coy, coz, cdx, cdy, cdz = camera_ray_tiles(
                cam_ref, nxf, nyf, jx, jy, lu, lv, width=width, height=height
            )
            rf = jnp.where(regen, 1.0, 0.0)
            ox = jnp.where(regen, cox, ox_s[:])
            oy = jnp.where(regen, coy, oy_s[:])
            oz = jnp.where(regen, coz, oz_s[:])
            dx = jnp.where(regen, cdx, dx_s[:])
            dy = jnp.where(regen, cdy, dy_s[:])
            dz = jnp.where(regen, cdz, dz_s[:])
            tr = jnp.where(regen, 1.0, tr_s[:])
            tg = jnp.where(regen, 1.0, tg_s[:])
            tb = jnp.where(regen, 1.0, tb_s[:])
            b = jnp.where(regen, jnp.uint32(0), b)
            alive = alive | regen
            out_n[:] = out_n[:] + jnp.where(alive, 1.0, 0.0)
            # npix is already the CURRENT bank's pixel for every lane (kb
            # was advanced at the previous flush), regen or not.
            pix = npix

            # ---- record the iteration's entry (post-regen) residuals -----
            if emit_full:
                res[0][kl] = ox
                res[1][kl] = oy
                res[2][kl] = oz
                res[3][kl] = dx
                res[4][kl] = dy
                res[5][kl] = dz
                res[6][kl] = tr
                res[7][kl] = tg
                res[8][kl] = tb
                res[9][kl] = jnp.where(alive, 1.0, 0.0)
                res[10][kl] = rf
                res[11][kl] = pltpu.bitcast(kb, jnp.int32)
                res[12][kl] = pltpu.bitcast(s, jnp.int32)
                res[13][kl] = pltpu.bitcast(b, jnp.int32)

            # ---- closest hit + shared differentiable bounce --------------
            u = _uniforms7_tile(k0, k1, pix, samp, b)
            blk = None
            if soft:
                # Validity + crossing coins share one eval (slot 128 + b;
                # ops/sampling.crossing_noise): word 0 = plane-crossing,
                # word 1 = candidate validity.  The previous-winner carry
                # hard-gates the chain's own sphere (reset at regen).
                wx0, wuv = threefry2x32(
                    k0, k1, pix, c1b | (jnp.uint32(128) + b)
                )
                uv = to_unit_float(wuv)
                prev = jnp.where(regen, -1, prev_s[:])
                winner, (qi, qx, qy, qz, qr) = closest_hit_scan_soft(
                    tables, ox, oy, oz, dx, dy, dz, u[7], uv, prev, sil_ref,
                    n_spheres=n_spheres, t_min=t_min, t_max=t_max,
                    softness=softness,
                )
                qi = jnp.where(alive, qi, -1)
                blk = (qi >= 0, qx, qy, qz, qr)
            else:
                winner = closest_hit_scan(
                    tables, ox, oy, oz, dx, dy, dz,
                    n_spheres=n_spheres, t_min=t_min, t_max=t_max,
                )
            if use_plane:
                # Ground plane winner, code PLANE_IDX (10-bit packable;
                # skips the sphere bucket).  encode_params: (cx..cz, r)
                # carry (unit normal, offset) so bounce_tile computes the
                # true plane t (see plane_override docstring).
                if soft:
                    # Stochastic plane-vs-sphere winner select (round 5,
                    # opaque-opaque intersection edges): coin at slot
                    # 128 + b (ops/sampling.crossing_noise), band scale
                    # sigma_x from the scan winner's radius.  Where the
                    # plane wins the coin against an in-band accepted
                    # sphere, that sphere becomes the lane's blocker (the
                    # crossing LOSER) so the backward's detached ratio can
                    # differentiate P(plane wins) from its attributes —
                    # bounce_tile tells the two blocker roles apart by
                    # replaying the acceptance coin.
                    from .intersect import crossing_scale

                    ux = to_unit_float(wx0)
                    pre_t, pre_i = winner[0], winner[1]
                    pre_cx, pre_cy, pre_cz, pre_r = (
                        winner[2], winner[3], winner[4], winner[5]
                    )
                    sigx = crossing_scale(softness, pre_r)
                    thr_x = silhouette_logit_tile(ux) * sigx
                    winner, wins, tp_t = plane_override(
                        plane_ref, winner, ox, oy, oz, dx, dy, dz,
                        t_min=t_min, hit_code=PLANE_IDX, encode_params=True,
                        thr_x=thr_x, t_max=t_max,
                    )
                    steal = (
                        wins & (pre_i >= 0)
                        & (pre_t - tp_t < 30.0 * sigx)
                    )
                    qi = jnp.where(steal, pre_i, qi)
                    qx = jnp.where(steal, pre_cx, qx)
                    qy = jnp.where(steal, pre_cy, qy)
                    qz = jnp.where(steal, pre_cz, qz)
                    qr = jnp.where(steal, pre_r, qr)
                    blk = (qi >= 0, qx, qy, qz, qr)
                else:
                    winner = plane_override(
                        plane_ref, winner, ox, oy, oz, dx, dy, dz,
                        t_min=t_min, hit_code=PLANE_IDX, encode_params=True,
                    )
            (t_scan, bi, wcx, wcy, wcz, wr, war, wag, wab, wmat, wfz, wio) = winner
            del t_scan
            hit = bi >= 0
            idx_masked = jnp.where(alive & hit, bi, -1)
            if emit_full:
                idx_out[kl] = idx_masked
                if soft:
                    res[25][kl] = qi
                    res[26][kl] = qx
                    res[27][kl] = qy
                    res[28][kl] = qz
                    res[29][kl] = qr
            else:
                # Pack idx+1 (10 bits, 0 = miss/dead) into word field kl % 3;
                # every iteration overwrites the word's plane (last of the 3
                # wins), so no conditional store is needed.  Field selection
                # by i32 multiply — Mosaic has no variable-amount tile shift.
                field = kl % _IDX_PACK
                factor = jnp.where(
                    field == 0, 1, jnp.where(field == 1, 1 << _IDX_BITS, 1 << (2 * _IDX_BITS))
                )
                first = (jnp.zeros(shape, jnp.int32) + field) == 0
                word = jnp.where(first, idx_masked + 1, word + (idx_masked + 1) * factor)
                idx_out[kl // _IDX_PACK] = word
                if soft:
                    bword = jnp.where(first, qi + 1, bword + (qi + 1) * factor)
                    bidx_out[kl // _IDX_PACK] = bword
            a9 = (wcx, wcy, wcz, wr, war, wag, wab, wfz, wio)
            if emit_full:
                res[15][kl] = wmat
                for j, a in enumerate(a9):
                    res[16 + j][kl] = a

            do_rr = b >= jnp.uint32(rr_start_depth)
            sil = None
            if soft:
                if use_plane:
                    sil = (jnp.where(bi != PLANE_IDX, 1.0, 0.0), softness)
                else:
                    sil = (jnp.ones(shape, f32), softness)
            sky6 = tuple(sky_ref[i] for i in range(6))
            pm = (bi == PLANE_IDX) if use_plane else None
            (no3, nd3, ntp3, rad3, surv_f) = bounce_tile(
                (ox, oy, oz), (dx, dy, dz), (tr, tg, tb),
                a9, wmat, hit, alive, u, sky6, do_rr,
                t_min=t_min, t_max=t_max, rr_on=bool(rr_start_depth),
                silhouette=sil, plane_mask=pm, blocker=blk,
            )
            # Depth budget termination on top of scatter/RR termination
            # (the per-bounce path terminates by scan length instead).
            b_next = b + jnp.uint32(1)
            surv = (surv_f > 0.0) & (b_next < jnp.uint32(max_depth))

            acr = acr_s[:] + rad3[0]
            acg = acg_s[:] + rad3[1]
            acb = acb_s[:] + rad3[2]

            terminated = alive & ~surv
            s_next = s + jnp.uint32(1)
            bank_done = s_next >= nsamp_u
            flush = terminated & bank_done
            flush_f = jnp.where(flush, 1.0, 0.0)
            for k in range(n_banks):
                mk = flush_f * jnp.where(kb == jnp.uint32(k), 1.0, 0.0)
                out_r[k] = out_r[k] + acr * mk
                out_g[k] = out_g[k] + acg * mk
                out_b[k] = out_b[k] + acb * mk
            keep = 1.0 - flush_f
            acr_s[:] = acr * keep
            acg_s[:] = acg * keep
            acb_s[:] = acb * keep

            ox_s[:], oy_s[:], oz_s[:] = no3
            dx_s[:], dy_s[:], dz_s[:] = nd3
            tr_s[:], tg_s[:], tb_s[:] = ntp3
            b_s[:] = jnp.where(surv, b_next, b)
            s_s[:] = jnp.where(
                terminated, jnp.where(bank_done, jnp.uint32(0), s_next), s
            )
            kb_s[:] = jnp.where(flush, kb + jnp.uint32(1), kb)
            alive_s[:] = jnp.where(surv, 1.0, 0.0)
            if soft:
                pn = jnp.where(hit, bi, -1)
                if use_plane:
                    pn = jnp.where(bi == PLANE_IDX, -1, pn)
                prev_s[:] = pn
            return (word, bword) if soft else (word,)

        zero_i = jnp.zeros(shape, jnp.int32)
        init = (zero_i, zero_i) if soft else (zero_i,)
        jax.lax.fori_loop(0, _CHUNK, body, init)

    def skip_chunk():
        # Fully-finished block: mark the chunk's iterations dead so the
        # backward pass and the bucket kernel skip them (their other
        # residual planes are never read when alive == 0 / idx == -1).
        zero = jnp.zeros(shape, f32)
        if emit_full:
            neg1 = jnp.full(shape, -1, jnp.int32)

            def body(kl, _):
                res[9][kl] = zero
                idx_out[kl] = neg1
                if soft:
                    res[25][kl] = neg1
                return 0

            jax.lax.fori_loop(0, _CHUNK, body, 0)
        else:
            # Packed planes: every 10-bit field 0 decodes to idx -1.
            for w in range(_CHUNK // _IDX_PACK):
                idx_out[w] = jnp.zeros(shape, jnp.int32)
                if soft:
                    bidx_out[w] = jnp.zeros(shape, jnp.int32)

    jax.lax.cond(busy, do_chunk, skip_chunk)


def _regen_bwd_kernel(
    # SMEM
    sky_ref, meta_ref, plane_ref,
    # VMEM inputs: residual planes for this chunk + pix banks + soff + ct
    e_ox, e_oy, e_oz, e_dx, e_dy, e_dz, e_tr, e_tg, e_tb,
    alive_r, regen_r, kb_r, s_r, b_r, idx_r, mat_r,
    a_cx, a_cy, a_cz, a_r, a_ar, a_ag, a_ab, a_fz, a_io,
    pix_ref, soff_ref,
    ctr_ref, ctg_ref, ctb_ref,     # (n_banks, 8, 128) radiance cotangents
    # then (soft only) 5 blocker residual planes, then the outputs:
    # per-iteration attr cotangents (9) [+ 4 blocker-attr cotangents when
    # soft] + sky partials (6) + plane partials (4), then 9 scratch refs
    # (carried cotangents).
    *rest,
    n_banks: int, max_depth: int, t_min: float, t_max: float,
    rr_start_depth: int, softness: float = 0.0, use_plane: bool = False,
):
    f32 = jnp.float32
    shape = (_SUB, _LANE)
    k0, k1 = meta_ref[0], meta_ref[1]
    soft = softness > 0.0
    if soft:
        (bq_idx, bq_cx, bq_cy, bq_cz, bq_r) = rest[:5]
        rest = rest[5:]
    (o_cx, o_cy, o_cz, o_r, o_ar, o_ag, o_ab, o_fz, o_io) = rest[:9]
    rest = rest[9:]
    if soft:
        (o_bcx, o_bcy, o_bcz, o_br) = rest[:4]
        rest = rest[4:]
        blk_outs = (o_bcx, o_bcy, o_bcz, o_br)
    (s_lor, s_log, s_lob, s_hir, s_hig, s_hib,
     p_off, p_ar, p_ag, p_ab) = rest[:10]
    (cox_s, coy_s, coz_s, cdx_s, cdy_s, cdz_s, ctr_s, ctg_s, ctb_s) = rest[10:]
    attr_outs = (o_cx, o_cy, o_cz, o_r, o_ar, o_ag, o_ab, o_fz, o_io)
    sky_accs = (s_lor, s_log, s_lob, s_hir, s_hig, s_hib)
    plane_accs = (p_off, p_ar, p_ag, p_ab)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init_sky():
        zero = jnp.zeros(shape, f32)
        for s in sky_accs + plane_accs:
            s[:] = zero

    @pl.when(pl.program_id(1) == 0)
    def _init_carries():
        zero = jnp.zeros(shape, f32)
        for s in (cox_s, coy_s, coz_s, cdx_s, cdy_s, cdz_s, ctr_s, ctg_s, ctb_s):
            s[:] = zero

    def body(i, _):
        kl = _CHUNK - 1 - i  # reverse within the chunk (chunks reversed by grid)
        alive = alive_r[kl] > 0.0

        def do_iter():
            o3 = (e_ox[kl], e_oy[kl], e_oz[kl])
            d3 = (e_dx[kl], e_dy[kl], e_dz[kl])
            tp3 = (e_tr[kl], e_tg[kl], e_tb[kl])
            a9 = tuple(r[kl] for r in (a_cx, a_cy, a_cz, a_r, a_ar, a_ag,
                                       a_ab, a_fz, a_io))
            mat = mat_r[kl]
            idxv = idx_r[kl]
            hit = idxv >= 0
            kb = pltpu.bitcast(kb_r[kl], jnp.uint32)
            s = pltpu.bitcast(s_r[kl], jnp.uint32)
            b = pltpu.bitcast(b_r[kl], jnp.uint32)
            samp = soff_ref[:] + s
            # Bank-select the lane's pixel id and radiance cotangent.
            pix = pix_ref[0]
            ctr, ctg, ctb = ctr_ref[0], ctg_ref[0], ctb_ref[0]
            for k in range(1, n_banks):
                in_k = kb == jnp.uint32(k)
                pix = jnp.where(in_k, pix_ref[k], pix)
                ctr = jnp.where(in_k, ctr_ref[k], ctr)
                ctg = jnp.where(in_k, ctg_ref[k], ctg)
                ctb = jnp.where(in_k, ctb_ref[k], ctb)

            u = _uniforms7_tile(k0, k1, pix, samp, b)
            do_rr = b >= jnp.uint32(rr_start_depth)
            # Sky as broadcast tiles: its adjoint (incl. the silhouette
            # score terms) rides the same pullback — a manual miss-only
            # accumulation once missed a blend term (caught by the round-4
            # combined-features test).
            skyt = tuple(jnp.full(shape, sky_ref[i2]) for i2 in range(6))

            pm = (idxv == PLANE_IDX) if use_plane else None
            cts = (
                (cox_s[:], coy_s[:], coz_s[:]),
                (cdx_s[:], cdy_s[:], cdz_s[:]),
                (ctr_s[:], ctg_s[:], ctb_s[:]),
                (ctr, ctg, ctb),
            )
            if soft:
                if use_plane:
                    sil = (jnp.where(idxv != PLANE_IDX, 1.0, 0.0), softness)
                else:
                    sil = (jnp.ones(shape, f32), softness)
                bval = bq_idx[kl] >= 0
                blk4 = (bq_cx[kl], bq_cy[kl], bq_cz[kl], bq_r[kl])

                if use_plane:
                    # Crossing factor (round 5): the plane's offset enters
                    # the stochastic winner-select probability on EVERY
                    # sphere-win lane (not just plane winners), so it is a
                    # differentiable vjp input of its own; the unit normal
                    # stays detached (closed-over broadcast tiles).  The
                    # validity coin uv (slot 128 + b, word 1) replays the
                    # blocker's coin tests for role disambiguation.
                    pn4 = tuple(
                        jnp.full(shape, plane_ref[i2]) for i2 in range(3)
                    )
                    pk_t = jnp.full(shape, plane_ref[3])
                    _, wuv = threefry2x32(
                        k0, k1, pix,
                        (samp << jnp.uint32(8)) | (jnp.uint32(128) + b),
                    )
                    uvt = to_unit_float(wuv)

                    def f(o3, d3, tp3, a9, sky6, blk4, pk_tile):
                        return bounce_tile(
                            o3, d3, tp3, a9, mat, hit, alive, u, sky6,
                            do_rr, t_min=t_min, t_max=t_max,
                            rr_on=bool(rr_start_depth),
                            silhouette=sil, plane_mask=pm,
                            blocker=(bval, *blk4),
                            plane4=(*pn4, pk_tile), uv=uvt,
                        )[:4]

                    _, pull = jax.vjp(f, o3, d3, tp3, a9, skyt, blk4, pk_t)
                    (ct_o, ct_d, ct_tp, ct_a9, ct_sky, ct_blk,
                     ct_pk) = pull(cts)
                    p_off[:] = p_off[:] + ct_pk
                else:

                    def f(o3, d3, tp3, a9, sky6, blk4):
                        return bounce_tile(
                            o3, d3, tp3, a9, mat, hit, alive, u, sky6,
                            do_rr, t_min=t_min, t_max=t_max,
                            rr_on=bool(rr_start_depth),
                            silhouette=sil, plane_mask=pm,
                            blocker=(bval, *blk4),
                        )[:4]

                    _, pull = jax.vjp(f, o3, d3, tp3, a9, skyt, blk4)
                    ct_o, ct_d, ct_tp, ct_a9, ct_sky, ct_blk = pull(cts)
                for ref, ct in zip(blk_outs, ct_blk):
                    ref[kl] = jnp.where(bval, ct, 0.0)
            else:

                def f(o3, d3, tp3, a9, sky6):
                    return bounce_tile(
                        o3, d3, tp3, a9, mat, hit, alive, u, sky6, do_rr,
                        t_min=t_min, t_max=t_max, rr_on=bool(rr_start_depth),
                        plane_mask=pm,
                    )[:4]

                _, pull = jax.vjp(f, o3, d3, tp3, a9, skyt)
                ct_o, ct_d, ct_tp, ct_a9, ct_sky = pull(cts)
            for ref, ct in zip(attr_outs, ct_a9):
                ref[kl] = jnp.where(hit, ct, 0.0)
            for c in range(6):
                sky_accs[c][:] = sky_accs[c][:] + ct_sky[c]
            if use_plane:
                # Plane cotangents: with the (normal, offset) winner
                # encoding, bounce_tile differentiates the TRUE plane
                # intersection w.r.t. (o, d) itself, and the offset's
                # cotangent is simply the a9 r-slot's.  Albedo maps 1:1;
                # normal-slot cotangents are discarded (not a parameter).
                is_pl = jnp.where(idxv == PLANE_IDX, 1.0, 0.0)
                p_off[:] = p_off[:] + ct_a9[3] * is_pl
                p_ar[:] = p_ar[:] + ct_a9[4] * is_pl
                p_ag[:] = p_ag[:] + ct_a9[5] * is_pl
                p_ab[:] = p_ab[:] + ct_a9[6] * is_pl
            # Chain boundary: a regenerated lane's chain STARTED here; its
            # camera-ray entry is detached, and the PREVIOUS iteration (in
            # forward order) belongs to the prior chain whose final state
            # has no consumers — zero the carried cotangents there.
            rg = regen_r[kl] > 0.0
            keep = jnp.where(rg, 0.0, 1.0)
            cox_s[:] = ct_o[0] * keep
            coy_s[:] = ct_o[1] * keep
            coz_s[:] = ct_o[2] * keep
            cdx_s[:] = ct_d[0] * keep
            cdy_s[:] = ct_d[1] * keep
            cdz_s[:] = ct_d[2] * keep
            ctr_s[:] = ct_tp[0] * keep
            ctg_s[:] = ct_tp[1] * keep
            ctb_s[:] = ct_tp[2] * keep

        def skip_iter():
            # Unexecuted / all-dead iteration: identity on the carries; the
            # bucket kernel needs zero attr cotangents here (idx is -1, but
            # an uninitialized NaN would poison the one-hot dot).
            zero = jnp.zeros(shape, f32)
            for ref in attr_outs:
                ref[kl] = zero
            if soft:
                for ref in blk_outs:
                    ref[kl] = zero

        jax.lax.cond(jnp.any(alive), do_iter, skip_iter)
        return 0

    jax.lax.fori_loop(0, _CHUNK, body, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _regen_trace(pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7,
                 static_cfg, interpret):
    out, _ = _regen_fwd_impl(
        pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7, static_cfg,
        interpret
    )
    return out


def _regen_fwd_impl(pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7,
                    static_cfg, interpret, emit_idx_only=False):
    (n_banks, n_samples, max_depth, width, height, t_min, t_max,
     rr_start_depth, softness, use_plane) = static_cfg
    rows = pix.shape[1]
    n_blocks = rows // _SUB
    tables = pad_scene_tables(tables)
    s_pad = tables[0].shape[0]
    budget = n_banks * n_samples * max_depth
    n_chunks = -(-budget // _CHUNK)
    b_total = n_chunks * _CHUNK
    soft = softness > 0.0
    # Soft-scan SMEM aux (band scale + 1/r^2); tiny dummy when hard.
    sil2 = (
        soft_scan_tables(tables, softness) if soft
        else jnp.zeros((4,), jnp.float32)
    )
    n_res = (2 if soft else 1) if emit_idx_only else _n_res(softness)

    kernel = functools.partial(
        _regen_fwd_kernel,
        n_spheres=s_pad, n_banks=n_banks, n_samples=n_samples,
        max_depth=max_depth, width=width, height=height,
        t_min=t_min, t_max=t_max, rr_start_depth=rr_start_depth,
        softness=softness, use_plane=use_plane,
        emit_full=not emit_idx_only,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    bank_in = pl.BlockSpec(
        (n_banks, _SUB, _LANE), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
    )
    tile_in = pl.BlockSpec((_SUB, _LANE), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    bank_out = bank_in
    lane_out = pl.BlockSpec(
        (_SUB, _LANE), lambda i, j: (i, 0), memory_space=pltpu.VMEM
    )
    res_out = pl.BlockSpec(
        (_CHUNK, _SUB, _LANE), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    packed_out = pl.BlockSpec(
        (_CHUNK // _IDX_PACK, _SUB, _LANE), lambda i, j: (j, i, 0),
        memory_space=pltpu.VMEM,
    )
    vma = vma_union(pix, soff, meta2, *tables, sky6, plane7)

    def to_vma(x):
        missing = vma - getattr(jax.typeof(x), "vma", frozenset())
        return jax.lax.pcast(x, tuple(missing), to="varying") if missing else x

    soff_tile = to_vma(
        jnp.broadcast_to(jnp.asarray(soff, jnp.uint32), (rows, _LANE))
    )
    if vma:
        pix, xf, yf, plane7 = (to_vma(x) for x in (pix, xf, yf, plane7))
    bank_sds = jax.ShapeDtypeStruct((n_banks, rows, _LANE), jnp.float32, vma=vma)
    lane_sds = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32, vma=vma)
    f32res = jax.ShapeDtypeStruct((b_total, rows, _LANE), jnp.float32, vma=vma)
    i32res = jax.ShapeDtypeStruct((b_total, rows, _LANE), jnp.int32, vma=vma)
    if emit_idx_only:
        packed_sds = jax.ShapeDtypeStruct(
            (b_total // _IDX_PACK, rows, _LANE), jnp.int32, vma=vma
        )
        # Soft configs stream TWO packed planes: winner + blocker indices.
        res_dtypes = [packed_sds] * n_res
        res_specs = [packed_out] * n_res
    else:
        res_dtypes = [f32res] * 11 + [i32res] * 5 + [f32res] * 9
        if soft:
            res_dtypes += [i32res] + [f32res] * 4
        res_specs = [res_out] * n_res
    scratch = [pltpu.VMEM((_SUB, _LANE), jnp.uint32)] * 3 + [
        pltpu.VMEM((_SUB, _LANE), jnp.float32)
    ] * 13 + [pltpu.VMEM((_SUB, _LANE), jnp.int32)]

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks),
        in_specs=[smem] * 16 + [bank_in] * 3 + [tile_in],
        out_specs=tuple([bank_out] * 3 + [lane_out] + res_specs),
        out_shape=tuple([bank_sds] * 3 + [lane_sds] + res_dtypes),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=35 * rows * _LANE * s_pad * max(1, budget // max_depth),
            bytes_accessed=4 * rows * _LANE * b_total * n_res,
            transcendentals=16 * rows * _LANE * budget,
        ),
        interpret=interpret,
    )(
        *tables, sky6, cam19, meta2, plane7, sil2,
        pix.astype(jnp.uint32), xf, yf, soff_tile,
    )
    out4 = tuple(outs[:4])      # radiance banks + per-lane iteration counts
    residuals = tuple(outs[4:])
    return out4, (residuals, pix, soff, meta2, sky6, plane7)


def _regen_fwd_rule(pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7,
                    static_cfg, interpret):
    out3, res = _regen_fwd_impl(
        pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7, static_cfg,
        interpret
    )
    return out3, (res, (xf, yf, cam19), tables[0].shape[0])


def _bwd_from_residuals(residuals, pix, soff, meta2, sky6, plane7, cts3,
                        static_cfg, interpret, s_real):
    """Backward kernel + MXU bucket pass over one chunk's 25 residual
    planes.  Shared by the per-chunk custom VJP (_regen_bwd_rule) and the
    streamed-idx path (_regen_stream_bwd_rule).  Returns
    (d_tab [s_pad, 9] — padded sphere-table cotangent columns,
    d_sky6 [6], d_plane4 [4] — offset + albedo rgb cotangents)."""
    from .pallas_bucket import bucket_cols_pallas

    (n_banks, n_samples, max_depth, width, height, t_min, t_max,
     rr_start_depth, softness, use_plane) = static_cfg
    ctr, ctg, ctb = cts3
    rows = pix.shape[1]
    n_blocks = rows // _SUB
    b_total = residuals[0].shape[0]
    n_chunks = b_total // _CHUNK
    s_pad = -(-s_real // 16) * 16
    soft = softness > 0.0

    kernel = functools.partial(
        _regen_bwd_kernel,
        n_banks=n_banks, max_depth=max_depth, t_min=t_min, t_max=t_max,
        rr_start_depth=rr_start_depth, softness=softness,
        use_plane=use_plane,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    # Chunks walked in REVERSE: grid step j reads residual chunk
    # n_chunks-1-j; within a chunk the kernel iterates local rows backward.
    res_in = pl.BlockSpec(
        (_CHUNK, _SUB, _LANE),
        lambda i, j, n=n_chunks: (n - 1 - j, i, 0),
        memory_space=pltpu.VMEM,
    )
    bank_in = pl.BlockSpec(
        (n_banks, _SUB, _LANE), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
    )
    tile_in = pl.BlockSpec((_SUB, _LANE), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    res_out = pl.BlockSpec(
        (_CHUNK, _SUB, _LANE),
        lambda i, j, n=n_chunks: (n - 1 - j, i, 0),
        memory_space=pltpu.VMEM,
    )
    pinned = pl.BlockSpec(
        (_SUB, _LANE), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    vma = vma_union(ctr, pix, soff, meta2, sky6, plane7, *residuals)

    def to_vma(x):
        missing = vma - getattr(jax.typeof(x), "vma", frozenset())
        return jax.lax.pcast(x, tuple(missing), to="varying") if missing else x

    soff_tile = to_vma(
        jnp.broadcast_to(jnp.asarray(soff, jnp.uint32), (rows, _LANE))
    )
    if vma:
        pix, plane7 = to_vma(pix), to_vma(plane7)
        ctr, ctg, ctb = (to_vma(x) for x in (ctr, ctg, ctb))
    f32res = jax.ShapeDtypeStruct((b_total, rows, _LANE), jnp.float32, vma=vma)
    sky_sds = jax.ShapeDtypeStruct((_SUB, _LANE), jnp.float32, vma=vma)
    scratch = [pltpu.VMEM((_SUB, _LANE), jnp.float32)] * 9

    n_blk = 4 if soft else 0
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks),
        in_specs=[smem] * 3 + [res_in] * _N_RES + [bank_in, tile_in]
        + [bank_in] * 3 + [res_in] * (5 if soft else 0),
        out_specs=tuple([res_out] * (9 + n_blk) + [pinned] * 10),
        out_shape=tuple([f32res] * (9 + n_blk) + [sky_sds] * 10),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=400 * rows * _LANE * b_total,
            bytes_accessed=4 * rows * _LANE * b_total * (_N_RES + 9),
            transcendentals=16 * rows * _LANE * b_total,
        ),
        interpret=interpret,
    )(
        sky6, meta2, plane7, *residuals[:_N_RES],
        pix.astype(jnp.uint32), soff_tile,
        ctr, ctg, ctb, *residuals[_N_RES:],
    )
    attr_cts = outs[:9]
    blk_cts = outs[9:9 + n_blk]
    sky_parts = outs[9 + n_blk:15 + n_blk]
    plane_parts = outs[15 + n_blk:]
    idx = residuals[14]
    # Bucket every iteration's attribute cotangents (dead and unexecuted
    # iterations carry idx == -1 and exact-zero cotangents, and take the
    # bucket kernel's dead-chunk skip).  The [K_pad, N] operand for the
    # FULL budget would be k_pad * b_total * rows * 128 * 4 bytes (~5 GB at
    # bench scale, on top of the ~10.5 GB of live residual + cotangent
    # planes), so slice the pass over the iteration dim and accumulate —
    # scan reuses one slice-sized buffer.
    slice_elems = 8 << 20                   # ~512 MB ctt slice at k_pad=16
    g = b_total
    for cand in range(b_total, 0, -1):
        if b_total % cand == 0 and cand * rows * _LANE <= slice_elems:
            g = cand
            break
    n_sl = b_total // g

    def bucket_all(cols9, idxp):
        if n_sl == 1:
            flat = lambda a: a.reshape(b_total * rows, _LANE)  # noqa: E731
            return bucket_cols_pallas(
                tuple(flat(a) for a in cols9), flat(idxp), s_pad,
                interpret=interpret,
            )
        sl = lambda a: a.reshape(n_sl, g * rows, _LANE)  # noqa: E731

        def bucket_slice(acc, xs):
            cols, idx_s = xs
            return acc + bucket_cols_pallas(
                cols, idx_s, s_pad, interpret=interpret
            ), None

        out, _ = jax.lax.scan(
            bucket_slice,
            to_vma(jnp.zeros((s_pad, 9), jnp.float32)),
            (tuple(sl(a) for a in cols9), sl(idxp)),
        )
        return out

    d_tab = bucket_all(attr_cts, idx)
    if soft:
        # Blocker-attr cotangents land in the same table rows (cx, cy, cz,
        # r columns) keyed by the recorded blocker index (residual 25).
        z = jnp.zeros_like(attr_cts[0])
        d_tab = d_tab + bucket_all(
            tuple(blk_cts) + (z, z, z, z, z), residuals[25]
        )
    d_sky6 = jnp.stack([jnp.sum(a) for a in sky_parts])
    d_plane4 = jnp.stack([jnp.sum(a) for a in plane_parts])
    return d_tab, d_sky6, d_plane4


def _tables_from_cols(d_tab, d_sky6, d_plane4, pix, xf, yf, soff, meta2,
                      cam19, s_real):
    """Package bucketed [s_pad, 9] columns + sky/plane partials into the
    custom VJP's cotangent structure (shared by both regen VJPs).  The
    plane cotangent covers offset + albedo; the unit normal is NOT a
    differentiable parameter (its [0:3] cotangents are zero — consistent
    with the jnp bounce, which detaches the plane normal)."""
    d_tab = d_tab[:s_real]

    def f0(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    d_tables = (
        d_tab[:, 0], d_tab[:, 1], d_tab[:, 2], d_tab[:, 3],
        d_tab[:, 3] * 0.0,                        # r2 (scan-only, detached)
        d_tab[:, 4], d_tab[:, 5], d_tab[:, 6],
        np.zeros((s_real,), jax.dtypes.float0),   # material (int)
        d_tab[:, 7], d_tab[:, 8],
    )
    return (
        f0(pix),                        # pix (u32)
        jnp.zeros_like(xf),             # xf (detached camera geometry)
        jnp.zeros_like(yf),             # yf
        f0(jnp.asarray(soff, jnp.uint32)),
        f0(meta2),
        jnp.zeros_like(cam19),          # camera constants (not a diff leaf)
        d_tables, d_sky6,
        jnp.concatenate([jnp.zeros((3,), jnp.float32), d_plane4]),
    )


def _regen_bwd_rule(static_cfg, interpret, resaux, ct):
    (residuals, pix, soff, meta2, sky6, plane7), (xf, yf, cam19), s_real = resaux
    ctr, ctg, ctb, _ct_n = ct   # iteration counts carry no gradient
    d_tab, d_sky6, d_plane4 = _bwd_from_residuals(
        residuals, pix, soff, meta2, sky6, plane7, (ctr, ctg, ctb),
        static_cfg, interpret, s_real,
    )
    return _tables_from_cols(
        d_tab, d_sky6, d_plane4, pix, xf, yf, soff, meta2, cam19, s_real
    )


_regen_trace.defvjp(_regen_fwd_rule, _regen_bwd_rule)


def render_block_grad_regen(
    scene, camera, config, key, pixel_ids, sample_offset, n_samples,
    n_banks=None, return_counts=False,
):
    """Differentiable per-pixel radiance SUM over ``n_samples`` via the
    regeneration kernels.  Drop-in for render_pixel_block's chunk step on
    the gradient path (same (pixel, sample) keying, ascending-sample
    accumulation order, same gradient semantics as the per-bounce fused
    path — equivalence-tested in tests/test_pallas_grad_regen.py).
    Returns [P, 3] f32 radiance sums."""
    from ..render import _persistent_args

    if n_banks is None:
        n_banks = DEFAULT_BANKS
    # Shared banked layout (pallas_common.banked_lane_layout): overflow
    # positions re-trace the last pixel; their radiance is sliced away by
    # unbank and their radiance COTANGENT arrives as exactly zero (the
    # slice's transpose zero-fills), so duplicate chains contribute nothing.
    n_banks, n_lanes, rows, pix, xf, yf, unbank = banked_lane_layout(
        pixel_ids, config.width, n_banks
    )
    tables, sky6, cam19, kd = _persistent_args(scene, camera, config, key)
    # The camera is not a differentiable leaf on this path (matching
    # trace_pixels_fused); its constants enter as a detached traced array.
    cam19 = jax.lax.stop_gradient(cam19)
    # Keep radii differentiable but the scan-only r2 slot detached, exactly
    # like the per-bounce fused path (_fused_radiance_tiles).
    tables = tuple(
        jax.lax.stop_gradient(t) if i == 4 else t for i, t in enumerate(tables)
    )
    meta2 = jnp.asarray(kd, jnp.uint32).reshape(2)
    if scene.plane is not None:
        # Plane normal is not a differentiable parameter (unit-constrained;
        # matches the jnp bounce, which detaches it) — offset + albedo are.
        plane7 = jnp.concatenate([
            jax.lax.stop_gradient(jnp.asarray(scene.plane[:3], jnp.float32)),
            jnp.asarray(scene.plane[3:], jnp.float32),
        ])
        use_plane = True
    else:
        plane7 = jnp.zeros((7,), jnp.float32)
        use_plane = False
    static_cfg = (
        n_banks, int(n_samples), int(config.max_depth),
        int(config.width), int(config.height),
        float(config.t_min), float(config.t_max),
        int(config.rr_start_depth), float(config.silhouette_softness),
        use_plane,
    )
    out_r, out_g, out_b, out_n = _regen_trace(
        pix, xf, yf, jnp.asarray(sample_offset, jnp.uint32), meta2, cam19,
        tables, sky6, plane7, static_cfg, bool(config.pallas_interpret),
    )

    img = jnp.stack([unbank(out_r), unbank(out_g), unbank(out_b)], axis=-1)
    if return_counts:
        # Per-LANE live-iteration totals (diagnostic: block max / mean is
        # the straggler factor; jnp.sum/1024-blocks is the utilization
        # numerator).  Shaped [lanes_pad] — lanes, not pixels.
        return img, out_n.reshape(-1)
    return img


# =============================================================================
# Streamed-idx gradient path: scan-free re-forward (round 3).
#
# The chunked-remat scheme above re-runs the FULL forward (sphere scan
# included) once per spp chunk to regenerate residuals — and the scan is
# ~85% of that kernel.  But the scan's only contribution to the chain is
# the winner INDEX: everything else (camera rays, bounce physics, RNG,
# termination) is deterministic given it.  So instead:
#
#   phase A  one idx-only forward over ALL samples (emit_idx_only=True:
#            the same kernel, 1 residual plane instead of 25 — ~4 bytes
#            per lane-iteration, pixels*spp*depth*4 total);
#   phase B  per spp chunk, a SCAN-FREE re-forward (_regen_refwd_kernel):
#            winner attributes come from the recorded idx via a one-hot
#            MXU contraction (~0.8 us/block-iter vs ~7.7 us for the scan,
#            experiments/mxu_scan_probe2.py), then the unchanged backward
#            kernel + bucket pass.
#
# Chunks hold whole chains (samples are chunked, never iterations), so no
# state crosses chunk boundaries, and the radiance cotangent is the same
# for every chunk (per-pixel sums are linear) — the remat re-forward was
# pure waste.  Orchestrated by _regen_trace_stream below; selected by
# render_pixel_block when chunking is active (config.grad_regen_stream).
# =============================================================================


def build_attr_matrix(tables):
    """[16, S_pad] winner-attribute matrix for the one-hot MXU gather:
    rows cx cy cz r albr albg albb mat fuzz ior, zero-padded to 16.

    The NaN radius of padding slots (pad_scene_tables) must be scrubbed:
    the gather contracts over EVERY slot and 0 * NaN = NaN.  Padding slots
    are never selected (their idx never wins), so 0 is safe."""
    cx, cy, cz, rad, _r2, ar, ag, ab, mat, fz, io = tables
    z = jnp.zeros_like(cx)
    return jnp.stack(
        [cx, cy, cz, jnp.nan_to_num(rad), ar, ag, ab,
         mat.astype(jnp.float32), fz, io, z, z, z, z, z, z], axis=0)


def _gather_attrs(ta_ref, idxv, s_pad):
    """Winner attributes by recorded index, as (a9 tuple, mat i32 tile).

    One-hot MXU contraction: oh[s, r] = (s == idx[r]), attrs = TA @ oh.
    The 0/1 one-hot picks exact table values (no rounding) under
    Precision.HIGHEST.  idx < 0 (miss or dead lane) selects nothing; the
    miss defaults r = 1, ior = 1 then reproduce closest_hit_scan's init
    winner exactly (pallas_common.closest_hit_scan init tuple), keeping
    the re-forward bit-identical to the recorded forward."""
    idx_row = idxv.reshape(1, _SUB * _LANE)
    sidx = jax.lax.broadcasted_iota(jnp.int32, (s_pad, _SUB * _LANE), 0)
    oh = jnp.where(sidx == idx_row, 1.0, 0.0)
    attrs = jax.lax.dot_general(
        ta_ref[:], oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    miss = idx_row < 0
    cols = []
    for j in range(10):
        v = attrs[j:j + 1]
        if j in (3, 9):   # radius / ior: scan's miss defaults are 1.0
            v = jnp.where(miss, 1.0, v)
        cols.append(v.reshape(_SUB, _LANE))
    (cx, cy, cz, r, ar, ag, ab, matf, fz, io) = cols
    return (cx, cy, cz, r, ar, ag, ab, fz, io), matf.astype(jnp.int32)


def _regen_refwd_kernel(
    # SMEM
    sky_ref, cam_ref, meta_ref, plane_ref,
    # VMEM inputs
    ta_ref,                       # [16, s_pad] attr matrix (pinned)
    pix_ref, xf_ref, yf_ref,      # (n_banks, 8, 128)
    soff_ref,                     # (8, 128) u32
    idx_in,                       # packed i32 recorded winner indices
    # then (soft only) the packed recorded blocker indices, then the
    # full residual-plane outputs, then scratch (ray state)
    *rest,
    s_pad: int, n_banks: int, n_samples: int, max_depth: int,
    width: int, height: int, t_min: float, t_max: float,
    rr_start_depth: int, softness: float = 0.0, use_plane: bool = False,
):
    """Scan-free re-forward: _regen_fwd_kernel with closest_hit_scan
    replaced by the recorded winner index + the one-hot attribute gather.
    State evolution is bit-identical to the recording forward (same
    camera/threefry/bounce_tile ops on identical inputs; winner attributes
    are exact table values either way), so the residual planes it emits
    are the ones the recording forward WOULD have emitted with
    emit_full=True — dead lanes excepted, whose stale-scan attributes the
    backward provably ignores (cotangents are masked by idx >= 0 and the
    carried cts across dead stretches are exactly zero)."""
    soft = softness > 0.0
    if soft:
        bidx_in = rest[0]
        rest = rest[1:]
    nr = _n_res(softness)
    res = rest[:nr]
    (kb_s, s_s, b_s, alive_s,
     ox_s, oy_s, oz_s, dx_s, dy_s, dz_s, tr_s, tg_s, tb_s) = rest[nr:]
    f32 = jnp.float32
    shape = (_SUB, _LANE)
    k0, k1 = meta_ref[0], meta_ref[1]
    nbank_u = jnp.uint32(n_banks)
    nsamp_u = jnp.uint32(n_samples)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        zero = jnp.zeros(shape, f32)
        kb_s[:] = jnp.zeros(shape, jnp.uint32)
        s_s[:] = jnp.zeros(shape, jnp.uint32)
        b_s[:] = jnp.zeros(shape, jnp.uint32)
        alive_s[:] = zero
        ox_s[:] = zero
        oy_s[:] = zero
        oz_s[:] = zero
        dx_s[:] = zero
        dy_s[:] = zero
        dz_s[:] = jnp.ones(shape, f32)
        tr_s[:] = jnp.ones(shape, f32)
        tg_s[:] = jnp.ones(shape, f32)
        tb_s[:] = jnp.ones(shape, f32)

    busy = jnp.any((kb_s[:] < nbank_u) | (alive_s[:] > 0.0))

    def do_chunk():
        def body(kl, _):
            alive = alive_s[:] > 0.0
            kb = kb_s[:]
            s = s_s[:]
            b = b_s[:]
            samp = soff_ref[:] + s

            # ---- regenerate exhausted lanes (same as the fwd kernel) ----
            regen = (~alive) & (kb < nbank_u)
            npix, nxf, nyf = pix_ref[0], xf_ref[0], yf_ref[0]
            for k in range(1, n_banks):
                in_k = kb == jnp.uint32(k)
                npix = jnp.where(in_k, pix_ref[k], npix)
                nxf = jnp.where(in_k, xf_ref[k], nxf)
                nyf = jnp.where(in_k, yf_ref[k], nyf)
            c1b = samp << jnp.uint32(8)
            w0, w1 = threefry2x32(k0, k1, npix, c1b | jnp.uint32(124))
            jx, jy = to_unit_float(w0), to_unit_float(w1)
            w0, w1 = threefry2x32(k0, k1, npix, c1b | jnp.uint32(125))
            lu, lv = to_unit_float(w0), to_unit_float(w1)
            cox, coy, coz, cdx, cdy, cdz = camera_ray_tiles(
                cam_ref, nxf, nyf, jx, jy, lu, lv, width=width, height=height
            )
            rf = jnp.where(regen, 1.0, 0.0)
            ox = jnp.where(regen, cox, ox_s[:])
            oy = jnp.where(regen, coy, oy_s[:])
            oz = jnp.where(regen, coz, oz_s[:])
            dx = jnp.where(regen, cdx, dx_s[:])
            dy = jnp.where(regen, cdy, dy_s[:])
            dz = jnp.where(regen, cdz, dz_s[:])
            tr = jnp.where(regen, 1.0, tr_s[:])
            tg = jnp.where(regen, 1.0, tg_s[:])
            tb = jnp.where(regen, 1.0, tb_s[:])
            b = jnp.where(regen, jnp.uint32(0), b)
            alive = alive | regen
            pix = npix

            # ---- emit the iteration's entry residuals -------------------
            res[0][kl] = ox
            res[1][kl] = oy
            res[2][kl] = oz
            res[3][kl] = dx
            res[4][kl] = dy
            res[5][kl] = dz
            res[6][kl] = tr
            res[7][kl] = tg
            res[8][kl] = tb
            res[9][kl] = jnp.where(alive, 1.0, 0.0)
            res[10][kl] = rf
            res[11][kl] = pltpu.bitcast(kb, jnp.int32)
            res[12][kl] = pltpu.bitcast(s, jnp.int32)
            res[13][kl] = pltpu.bitcast(b, jnp.int32)

            # ---- recorded winner instead of the sphere scan --------------
            # Unpack field kl % 3 of the packed idx word (constant-amount
            # shifts + selects; Mosaic has no variable-amount tile shift).
            word = idx_in[kl // _IDX_PACK]
            f0 = word & _IDX_MASK
            f1 = (word >> _IDX_BITS) & _IDX_MASK
            f2 = (word >> (2 * _IDX_BITS)) & _IDX_MASK
            fieldt = jnp.zeros(shape, jnp.int32) + (kl % _IDX_PACK)
            idxv = jnp.where(
                fieldt == 0, f0, jnp.where(fieldt == 1, f1, f2)
            ) - 1
            hit = idxv >= 0
            a9, wmat = _gather_attrs(ta_ref, idxv, s_pad)
            if use_plane:
                # Plane lanes' recorded winner attrs are pure plane
                # constants under the (normal, offset) encoding — no
                # per-ray recomputation at all.
                is_pl = idxv == PLANE_IDX
                (g_cx, g_cy, g_cz, g_r, g_ar, g_ag, g_ab, g_fz, g_io) = a9
                sel = lambda pv, gv: jnp.where(is_pl, pv, gv)  # noqa: E731
                a9 = (
                    sel(plane_ref[0], g_cx), sel(plane_ref[1], g_cy),
                    sel(plane_ref[2], g_cz), sel(plane_ref[3], g_r),
                    sel(plane_ref[4], g_ar), sel(plane_ref[5], g_ag),
                    sel(plane_ref[6], g_ab), sel(0.0, g_fz),
                    sel(1.0, g_io),
                )
                wmat = jnp.where(is_pl, int(Material.LAMBERTIAN), wmat)
            res[14][kl] = idxv
            res[15][kl] = wmat
            for j, a in enumerate(a9):
                res[16 + j][kl] = a

            u = _uniforms7_tile(k0, k1, pix, samp, b)
            do_rr = b >= jnp.uint32(rr_start_depth)
            sil = blk = None
            if soft:
                # Recorded blocker index -> attrs via the same one-hot MXU
                # gather (rows 0-3 of the attr matrix are cx cy cz r).
                bw = bidx_in[kl // _IDX_PACK]
                bf0 = bw & _IDX_MASK
                bf1 = (bw >> _IDX_BITS) & _IDX_MASK
                bf2 = (bw >> (2 * _IDX_BITS)) & _IDX_MASK
                bfieldt = jnp.zeros(shape, jnp.int32) + (kl % _IDX_PACK)
                bidxv = jnp.where(
                    bfieldt == 0, bf0, jnp.where(bfieldt == 1, bf1, bf2)
                ) - 1
                ba9, _bmat = _gather_attrs(ta_ref, bidxv, s_pad)
                blk = (bidxv >= 0, ba9[0], ba9[1], ba9[2], ba9[3])
                res[25][kl] = bidxv
                res[26][kl] = ba9[0]
                res[27][kl] = ba9[1]
                res[28][kl] = ba9[2]
                res[29][kl] = ba9[3]
                if use_plane:
                    sil = (jnp.where(idxv != PLANE_IDX, 1.0, 0.0), softness)
                else:
                    sil = (jnp.ones(shape, f32), softness)
            sky6 = tuple(sky_ref[i] for i in range(6))
            pm = (idxv == PLANE_IDX) if use_plane else None
            (no3, nd3, ntp3, _rad3, surv_f) = bounce_tile(
                (ox, oy, oz), (dx, dy, dz), (tr, tg, tb),
                a9, wmat, hit, alive, u, sky6, do_rr,
                t_min=t_min, t_max=t_max, rr_on=bool(rr_start_depth),
                silhouette=sil, plane_mask=pm, blocker=blk,
            )
            b_next = b + jnp.uint32(1)
            surv = (surv_f > 0.0) & (b_next < jnp.uint32(max_depth))

            terminated = alive & ~surv
            s_next = s + jnp.uint32(1)
            bank_done = s_next >= nsamp_u
            flush = terminated & bank_done

            ox_s[:], oy_s[:], oz_s[:] = no3
            dx_s[:], dy_s[:], dz_s[:] = nd3
            tr_s[:], tg_s[:], tb_s[:] = ntp3
            b_s[:] = jnp.where(surv, b_next, b)
            s_s[:] = jnp.where(
                terminated, jnp.where(bank_done, jnp.uint32(0), s_next), s
            )
            kb_s[:] = jnp.where(flush, kb + jnp.uint32(1), kb)
            alive_s[:] = jnp.where(surv, 1.0, 0.0)
            return 0

        jax.lax.fori_loop(0, _CHUNK, body, 0)

    def skip_chunk():
        zero = jnp.zeros(shape, f32)
        neg1 = jnp.full(shape, -1, jnp.int32)

        def body(kl, _):
            res[9][kl] = zero
            res[14][kl] = neg1
            if soft:
                res[25][kl] = neg1
            return 0

        jax.lax.fori_loop(0, _CHUNK, body, 0)

    jax.lax.cond(busy, do_chunk, skip_chunk)


def _refwd_impl(pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7,
                idx_planes, static_cfg, interpret):
    """pallas_call wrapper for the scan-free re-forward: one spp chunk's
    full residual planes from its recorded idx plane(s) — ``idx_planes``
    is (winner,) or (winner, blocker) packed plane arrays."""
    (n_banks, n_samples, max_depth, width, height, t_min, t_max,
     rr_start_depth, softness, use_plane) = static_cfg
    soft = softness > 0.0
    if not isinstance(idx_planes, tuple):
        idx_planes = (idx_planes,)
    rows = pix.shape[1]
    n_blocks = rows // _SUB
    tables = pad_scene_tables(tables)
    s_pad = tables[0].shape[0]
    ta16 = build_attr_matrix(tables)
    budget = n_banks * n_samples * max_depth
    n_chunks = -(-budget // _CHUNK)
    b_total = n_chunks * _CHUNK
    assert idx_planes[0].shape[0] == b_total // _IDX_PACK, (
        idx_planes[0].shape, b_total)
    assert len(idx_planes) == (2 if soft else 1), (len(idx_planes), soft)

    kernel = functools.partial(
        _regen_refwd_kernel,
        s_pad=s_pad, n_banks=n_banks, n_samples=n_samples,
        max_depth=max_depth, width=width, height=height,
        t_min=t_min, t_max=t_max, rr_start_depth=rr_start_depth,
        softness=softness, use_plane=use_plane,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ta_spec = pl.BlockSpec(
        (16, s_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    bank_in = pl.BlockSpec(
        (n_banks, _SUB, _LANE), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
    )
    tile_in = pl.BlockSpec((_SUB, _LANE), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    res_spec = pl.BlockSpec(
        (_CHUNK, _SUB, _LANE), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
    )
    packed_spec = pl.BlockSpec(
        (_CHUNK // _IDX_PACK, _SUB, _LANE), lambda i, j: (j, i, 0),
        memory_space=pltpu.VMEM,
    )
    vma = vma_union(pix, soff, meta2, *tables, sky6, plane7, *idx_planes)

    def to_vma(x):
        missing = vma - getattr(jax.typeof(x), "vma", frozenset())
        return jax.lax.pcast(x, tuple(missing), to="varying") if missing else x

    soff_tile = to_vma(
        jnp.broadcast_to(jnp.asarray(soff, jnp.uint32), (rows, _LANE))
    )
    if vma:
        pix, xf, yf, ta16, cam19, plane7 = (
            to_vma(x) for x in (pix, xf, yf, ta16, cam19, plane7)
        )
        idx_planes = tuple(to_vma(x) for x in idx_planes)
    nr = _n_res(softness)
    f32res = jax.ShapeDtypeStruct((b_total, rows, _LANE), jnp.float32, vma=vma)
    i32res = jax.ShapeDtypeStruct((b_total, rows, _LANE), jnp.int32, vma=vma)
    res_dtypes = [f32res] * 11 + [i32res] * 5 + [f32res] * 9
    if soft:
        res_dtypes += [i32res] + [f32res] * 4
    scratch = [pltpu.VMEM((_SUB, _LANE), jnp.uint32)] * 3 + [
        pltpu.VMEM((_SUB, _LANE), jnp.float32)
    ] * 10

    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks),
        in_specs=[smem] * 4 + [ta_spec] + [bank_in] * 3 + [tile_in]
        + [packed_spec] * len(idx_planes),
        out_specs=tuple([res_spec] * nr),
        out_shape=tuple(res_dtypes),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=400 * rows * _LANE * b_total,
            bytes_accessed=4 * rows * _LANE * b_total * (nr + 1),
            transcendentals=16 * rows * _LANE * b_total,
        ),
        interpret=interpret,
    )(
        sky6, cam19, meta2, plane7, ta16,
        pix.astype(jnp.uint32), xf, yf, soff_tile, *idx_planes,
    )
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _regen_trace_stream(pix, xf, yf, soff, meta2, cam19, tables, sky6,
                        plane7, stream_cfg, interpret):
    out, _ = _stream_fwd_impl(
        pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7, stream_cfg,
        interpret
    )
    return out


def _stream_fwd_impl(pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7,
                     stream_cfg, interpret):
    static_cfg, n_chunks = stream_cfg
    n_banks, chunk = static_cfg[0], static_cfg[1]

    def one(c):
        soff_c = soff + jnp.uint32(chunk) * c.astype(jnp.uint32)
        out4, res = _regen_fwd_impl(
            pix, xf, yf, soff_c, meta2, cam19, tables, sky6, plane7,
            static_cfg, interpret, emit_idx_only=True,
        )
        # res[0]: (winner,) or (winner, blocker) packed idx planes.
        return out4, res[0]

    if n_chunks == 1:
        out4, planes0 = one(jnp.asarray(0, jnp.int32))
        return out4, tuple(p[None] for p in planes0)

    # Scan over ALL chunks so the idx planes come straight out of the scan
    # stack — a concatenate of a separately-run first chunk doubles the idx
    # allocation (a 3.6 GB copy at bench scale, the chunk-10 compile OOM).
    # The zero carry must match the kernel outputs' vma under shard_map.
    vma = vma_union(pix, soff, meta2, *tables, sky6, plane7)

    def to_vma(x):
        missing = vma - getattr(jax.typeof(x), "vma", frozenset())
        return jax.lax.pcast(x, tuple(missing), to="varying") if missing else x

    rows = pix.shape[1]
    carry0 = (
        to_vma(jnp.zeros((n_banks, rows, _LANE), jnp.float32)),
        to_vma(jnp.zeros((n_banks, rows, _LANE), jnp.float32)),
        to_vma(jnp.zeros((n_banks, rows, _LANE), jnp.float32)),
        to_vma(jnp.zeros((rows, _LANE), jnp.float32)),
    )

    def step(carry, c):
        o4, planes_c = one(c)
        return tuple(a + b for a, b in zip(carry, o4)), planes_c

    out4, idxs = jax.lax.scan(
        step, carry0, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return out4, idxs


def _regen_stream_fwd_rule(pix, xf, yf, soff, meta2, cam19, tables, sky6,
                           plane7, stream_cfg, interpret):
    out4, idxs = _stream_fwd_impl(
        pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7, stream_cfg,
        interpret
    )
    return out4, (idxs, pix, xf, yf, soff, meta2, cam19, tables, sky6,
                  plane7, tables[0].shape[0])


def _regen_stream_bwd_rule(stream_cfg, interpret, resaux, ct):
    (idxs, pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7,
     s_real) = resaux
    static_cfg, n_chunks = stream_cfg
    chunk = static_cfg[1]
    ctr, ctg, ctb, _ct_n = ct
    s_pad = -(-s_real // 16) * 16
    vma = vma_union(ctr, pix, *idxs, *tables)

    def to_vma(x):
        missing = vma - getattr(jax.typeof(x), "vma", frozenset())
        return jax.lax.pcast(x, tuple(missing), to="varying") if missing else x

    def step(carry, xs):
        idx_c, c = xs
        soff_c = soff + jnp.uint32(chunk) * c.astype(jnp.uint32)
        res25 = _refwd_impl(
            pix, xf, yf, soff_c, meta2, cam19, tables, sky6, plane7, idx_c,
            static_cfg, interpret,
        )
        d_tab, d_sky, d_pl = _bwd_from_residuals(
            res25, pix, soff_c, meta2, sky6, plane7, (ctr, ctg, ctb),
            static_cfg, interpret, s_real,
        )
        return (carry[0] + d_tab, carry[1] + d_sky, carry[2] + d_pl), None

    init = (
        to_vma(jnp.zeros((s_pad, 9), jnp.float32)),
        to_vma(jnp.zeros((6,), jnp.float32)),
        to_vma(jnp.zeros((4,), jnp.float32)),
    )
    (d_tab, d_sky6, d_plane4), _ = jax.lax.scan(
        step, init, (idxs, jnp.arange(n_chunks, dtype=jnp.int32))
    )
    return _tables_from_cols(
        d_tab, d_sky6, d_plane4, pix, xf, yf, soff, meta2, cam19, s_real
    )


_regen_trace_stream.defvjp(_regen_stream_fwd_rule, _regen_stream_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _regen_trace_ckstream(pix, xf, yf, soff, meta2, cam19, tables, sky6,
                          plane7, stream_cfg, interpret):
    out, _ = _stream_fwd_impl(
        pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7, stream_cfg,
        interpret
    )
    return out


def _ckstream_fwd_rule(pix, xf, yf, soff, meta2, cam19, tables, sky6,
                       plane7, stream_cfg, interpret):
    # Same forward as the streamed path, but the idx planes are DISCARDED
    # (holding every chunk's planes is exactly what exceeds the budget
    # beyond ~500 spp); the backward re-records them one chunk at a time.
    out4, _idxs = _stream_fwd_impl(
        pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7, stream_cfg,
        interpret
    )
    return out4, (pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7,
                  tables[0].shape[0])


def _ckstream_bwd_rule(stream_cfg, interpret, resaux, ct):
    """Deterministic beyond-capacity gradient (round-5 VERDICT item 4).

    Per chunk: re-run the idx-RECORD forward (the same pallas_call jaxpr —
    and therefore the same Mosaic binary — as the value pass, so the
    re-recorded winners are bit-identical to the value pass's), then the
    scan-free replay + backward consume the RECORDED planes.  Only one
    chunk's idx planes are ever live.  This replaces the jax.checkpoint
    remat fallback, whose REPLAYED forward was a different XLA program
    that could flip knife-edge winners at many-sphere scenes (CLAUDE.md
    round 4).  Cost: one extra scan pass per chunk vs the remat fallback's
    re-forward — measured ~6% at bench scale (BASELINE round 4's
    "checkpointed stream"), only paid beyond streamed-idx capacity.
    """
    (pix, xf, yf, soff, meta2, cam19, tables, sky6, plane7,
     s_real) = resaux
    static_cfg, n_chunks = stream_cfg
    chunk = static_cfg[1]
    ctr, ctg, ctb, _ct_n = ct
    s_pad = -(-s_real // 16) * 16
    vma = vma_union(ctr, pix, *tables)

    def to_vma(x):
        missing = vma - getattr(jax.typeof(x), "vma", frozenset())
        return jax.lax.pcast(x, tuple(missing), to="varying") if missing else x

    def step(carry, c):
        soff_c = soff + jnp.uint32(chunk) * c.astype(jnp.uint32)
        _out4, res = _regen_fwd_impl(
            pix, xf, yf, soff_c, meta2, cam19, tables, sky6, plane7,
            static_cfg, interpret, emit_idx_only=True,
        )
        res25 = _refwd_impl(
            pix, xf, yf, soff_c, meta2, cam19, tables, sky6, plane7,
            res[0], static_cfg, interpret,
        )
        d_tab, d_sky, d_pl = _bwd_from_residuals(
            res25, pix, soff_c, meta2, sky6, plane7, (ctr, ctg, ctb),
            static_cfg, interpret, s_real,
        )
        return (carry[0] + d_tab, carry[1] + d_sky, carry[2] + d_pl), None

    init = (
        to_vma(jnp.zeros((s_pad, 9), jnp.float32)),
        to_vma(jnp.zeros((6,), jnp.float32)),
        to_vma(jnp.zeros((4,), jnp.float32)),
    )
    (d_tab, d_sky6, d_plane4), _ = jax.lax.scan(
        step, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return _tables_from_cols(
        d_tab, d_sky6, d_plane4, pix, xf, yf, soff, meta2, cam19, s_real
    )


_regen_trace_ckstream.defvjp(_ckstream_fwd_rule, _ckstream_bwd_rule)


def render_block_grad_regen_stream(
    scene, camera, config, key, pixel_ids, sample_offset, n_samples, chunk,
    n_banks=None, checkpoint_idx=False,
):
    """Differentiable per-pixel radiance SUM over ``n_samples`` via the
    streamed-idx scheme: one idx-only forward over all samples, then (under
    autodiff) a scan-free re-forward + backward per ``chunk``-sample group.
    Peak residual memory is one chunk's 25 planes plus the idx planes for
    every sample (4 B per lane-iteration) — the remat re-forward and its
    sphere scans are gone.  Radiance (and therefore the loss) is
    bit-identical to the chunked render_block_grad_regen path: phase A runs
    the same forward kernel code.  Requires n_samples % chunk == 0."""
    from ..render import _persistent_args

    assert n_samples % chunk == 0, (n_samples, chunk)
    if n_banks is None:
        n_banks = DEFAULT_BANKS
    n_banks, n_lanes, rows, pix, xf, yf, unbank = banked_lane_layout(
        pixel_ids, config.width, n_banks
    )
    tables, sky6, cam19, kd = _persistent_args(scene, camera, config, key)
    cam19 = jax.lax.stop_gradient(cam19)
    tables = tuple(
        jax.lax.stop_gradient(t) if i == 4 else t for i, t in enumerate(tables)
    )
    meta2 = jnp.asarray(kd, jnp.uint32).reshape(2)
    if scene.plane is not None:
        # Plane normal is not a differentiable parameter (unit-constrained;
        # matches the jnp bounce, which detaches it) — offset + albedo are.
        plane7 = jnp.concatenate([
            jax.lax.stop_gradient(jnp.asarray(scene.plane[:3], jnp.float32)),
            jnp.asarray(scene.plane[3:], jnp.float32),
        ])
        use_plane = True
    else:
        plane7 = jnp.zeros((7,), jnp.float32)
        use_plane = False
    static_cfg = (
        n_banks, int(chunk), int(config.max_depth),
        int(config.width), int(config.height),
        float(config.t_min), float(config.t_max),
        int(config.rr_start_depth), float(config.silhouette_softness),
        use_plane,
    )
    stream_cfg = (static_cfg, int(n_samples) // int(chunk))
    # checkpoint_idx: the beyond-capacity DETERMINISTIC fallback — idx
    # planes are re-recorded per chunk in the backward instead of held for
    # every chunk (see _ckstream_bwd_rule).
    trace = _regen_trace_ckstream if checkpoint_idx else _regen_trace_stream
    out_r, out_g, out_b, _out_n = trace(
        pix, xf, yf, jnp.asarray(sample_offset, jnp.uint32), meta2, cam19,
        tables, sky6, plane7, stream_cfg, bool(config.pallas_interpret),
    )
    return jnp.stack([unbank(out_r), unbank(out_g), unbank(out_b)], axis=-1)
