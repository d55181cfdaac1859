"""Fully-fused differentiable path tracing: Pallas forward AND backward.

The round-1/2 gradient path ran the bounce loop in XLA jnp ops with only the
closest-hit scan in a kernel (render.py use_pallas_hits).  Measured on a v5e
chip, that XLA glue runs ~10-20x below VPU speed-of-light for this workload
(threefry alone: 17 ms in XLA for <1 ms of VPU work), putting fwd+bwd at
~197 ms per 960k-path frame while the pure-forward kernel needs ~21 ms.

This module moves the WHOLE differentiable bounce into Pallas:

  * `_grad_fwd_kernel` — one bounce per call, same tile physics as the
    forward megakernel (pallas_common), but it additionally emits the
    per-ray residuals the backward needs: the winner index (masked to -1
    where the lane is dead, so zero-cotangent chunks are detectable) and
    the winner's 9 float attributes + material, selected inline during the
    scan (no [N]-sized gathers anywhere).
  * `_grad_bwd_kernel` — one bounce per call, walked in reverse.  It
    rebuilds the bounce's differentiable computation from the residuals
    (hit-t recomputation exactly like ops/intersect.hit_from_gathered,
    scatter via the shared pallas_common.scatter_tiles, RNG recomputed from
    the threefry counters) and obtains its adjoints by calling ``jax.vjp``
    ON THE TILE FUNCTION INSIDE THE KERNEL BODY: the linearized and
    transposed ops are traced at kernel-build time and compiled by Mosaic
    like any other tile math.  No hand-derived gradients anywhere, so the
    kernel cannot drift from the jnp reference semantics.
  * Table cotangents leave the backward kernel as 9 [N]-column tiles and
    are bucket-accumulated by ops/pallas_bucket (MXU one-hot matmuls) with
    dead-chunk skipping driven by the masked winner index.
  * Sky cotangents accumulate in-kernel into six grid-pinned partial-sum
    tiles (one XLA reduction of (8,128) each at the end).

The public entry is `trace_rays_fused` — a drop-in replacement for
render.trace_rays under ``jax.grad`` (config.use_pallas_grad).  Gradient
semantics match the jnp bounce: the hit selection and material/coin
branches are locally constant (discrete), t/normal/attenuation/throughput
flow, and the clamp floors (_DISC_EPS etc.) are identical.

Reference counterpart: none — the reference (ilia-glushchenko/
SimplePathTracer) is not differentiable.  The loop being differentiated is
its TraceAndSampleColor (include/SingleThreadPathTracer.hpp:94-112) over
FindClosestIntersectionSphere (include/Collision.hpp:87-109).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import SIL_P_FLOOR, silhouette_scale
from .pallas_common import (
    LANE as _LANE,
    SUB as _SUB,
    camera_ray_tiles,
    closest_hit_scan,
    closest_hit_scan_soft,
    pad_scene_tables,
    scatter_tiles,
    soft_scan_tables,
    threefry2x32,
    to_unit_float,
    vma_union,
)

_BLOCK = _SUB * _LANE
_DISC_EPS = 1e-12  # == ops/intersect._DISC_EPS (gradient floor at grazing hits)


def _SIL_FRESNEL_ON():
    """Trace-time read of the estimator-ablation switch (intersect
    .SIL_FRESNEL) — module attribute so experiments can A/B it."""
    from . import intersect

    return intersect.SIL_FRESNEL


def _uniforms7(k0, k1, pix, samp, bounce):
    """The 8 bounce uniforms (slot map of ops/sampling.py) as (8,128) tiles
    — column 7 is the soft-silhouette acceptance coin (round 5; the name
    predates it)."""
    c1b = samp << jnp.uint32(8)
    slot0 = bounce * jnp.uint32(4)
    u = []
    for e in range(4):
        w0, w1 = threefry2x32(k0, k1, pix, c1b | (slot0 + jnp.uint32(e)))
        u.append(to_unit_float(w0))
        u.append(to_unit_float(w1))
    return tuple(u)


def bounce_tile(
    o3, d3, tp3, a9, mat, hit, alive, u, sky6, do_rr,
    *, t_min: float, t_max: float, rr_on: bool, silhouette=None,
    plane_mask=None, blocker=None, plane4=None, uv=None,
):
    """One differentiable bounce on (8,128) tiles.

    Differentiable args: o3/d3 (ray), tp3 (throughput), a9 (winner
    attributes cx cy cz r albr albg albb fuzz ior), and — under the soft
    scheme — the blocker attributes.  Everything else is discrete /
    reparameterized-constant, exactly like the jnp bounce (render.py):
    `mat`/`hit`/`alive` masks, the uniforms `u`, the RR gate `do_rr`.
    `sky6` enters as closed-over values; its cotangent is accumulated by
    the backward kernels through the same traced pullback.

    ``silhouette``: None, or (mask_tile, softness) enabling the TWO-SIDED
    stochastic-transparency silhouette scheme (round 5) on the masked
    lanes (callers pass all live sphere-hit lanes — plane winners
    excluded).  The scan already made acceptance stochastic (shared coin,
    closest_hit_scan_soft); here the realized outcome's probability
    p = We - M (We = winner opacity sigmoid(disc/(soft r^2)), 1 on
    miss/plane lanes; M = the strongest rejected front blocker's opacity,
    0 if none) scales ALL of this bounce's radiance and the carried
    throughput by the detached ratio p / stop_grad(p) == 1: values are
    untouched, and the vjp carries L * d log p — in expectation the full
    two-sided visibility gradient dw * (L_front - L_behind) (the round-4
    one-sided blend measured AD/FD = 0.49 on geometry leaves).  Applied
    at EVERY bounce, so occlusion edges seen by secondary rays
    differentiate through the ray origin too.

    ``blocker``: required with silhouette — (valid_mask, bcx, bcy, bcz,
    br) from the soft scan; the four attribute tiles are differentiable
    (their cotangents bucket into the sphere tables by blocker index).

    ``plane_mask``: None, or a bool tile marking ground-plane winner
    lanes.  For those lanes a9's (cx, cy, cz) slots carry the plane's UNIT
    NORMAL and the r slot its OFFSET k (surface {p : n.p + k = 0}) — the
    hit t is then the true plane intersection (well-conditioned at grazing
    incidence, where the virtual-sphere form's tc - sqrt(disc) cancels
    catastrophically) and the normal is the face-forward plane normal.
    The offset's cotangent falls out of the ordinary a9 vjp (the r slot);
    normal-slot cotangents are discarded by the caller (the unit normal is
    not a differentiable parameter).

    Returns (o'3, d'3, tp'3, rad_contrib3, surv_f).  Ops and clamp floors
    mirror ops/intersect.hit_from_gathered + ops/materials.scatter_attrs +
    the render.py carry updates, so ``jax.vjp`` of this function equals the
    jnp path's gradients.
    """
    ox, oy, oz = o3
    dx, dy, dz = d3
    tr, tg, tb = tp3
    cx, cy, cz, r, ar, ag, ab, fz, io = a9

    # Differentiable hit reconstruction (intersect.hit_from_gathered).
    ocx, ocy, ocz = cx - ox, cy - oy, cz - oz
    tc = ocx * dx + ocy * dy + ocz * dz
    oc2 = ocx * ocx + ocy * ocy + ocz * ocz
    disc = r * r - (oc2 - tc * tc)
    if silhouette is not None:
        # Grazing/phantom winners are common under the soft scheme; cap
        # d sqrt at the band scale (value-exact, see grad_capped_sqrt).
        from .intersect import grad_capped_sqrt

        sq = grad_capped_sqrt(
            jnp.maximum(disc, _DISC_EPS), silhouette_scale(silhouette[1], r)
        )
    else:
        sq = jnp.sqrt(jnp.maximum(disc, _DISC_EPS))
    t_near = tc - sq
    t_raw_w = jnp.where(t_near > t_min, t_near, tc + sq)
    t = t_raw_w
    if silhouette is not None:
        # Realized-t clamp of the validity coin (round 5): a coin-validated
        # marginal candidate hits AT the origin, never behind it — matches
        # the scan (intersect_scene_soft / closest_hit_scan_soft).
        t = jnp.maximum(t, t_min)
    t = jnp.where(hit, t, t_max)
    if plane_mask is not None:
        # True plane intersection for plane-winner lanes (see docstring):
        # cx..cz = unit normal, r = offset k.
        den_p = dx * cx + dy * cy + dz * cz
        den_s = jnp.where(jnp.abs(den_p) > 1e-8, den_p, 1.0)
        t_pl = (-(ox * cx + oy * cy + oz * cz) - r) / den_s
        t = jnp.where(plane_mask, t_pl, t)
        psgn = jnp.where(den_p > 0.0, -1.0, 1.0)
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz
    nx = (px - cx) / r
    ny = (py - cy) / r
    nz = (pz - cz) / r
    ninv = 1.0 / jnp.sqrt(nx * nx + ny * ny + nz * nz + 1e-20)
    nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
    if plane_mask is not None:
        # Face-forward plane normal (opposing the ray).
        nx = jnp.where(plane_mask, psgn * cx, nx)
        ny = jnp.where(plane_mask, psgn * cy, ny)
        nz = jnp.where(plane_mask, psgn * cz, nz)

    if silhouette is not None:
        # Two-sided detached probability ratio (see docstring): scale the
        # ENTRY throughput so this bounce's miss radiance and everything
        # downstream carry the score terms.  Clamps saturate the sigmoid
        # exactly in f32 and zero the vjp on dead lanes' garbage attrs.
        smask, soft = silhouette
        xs = jnp.clip(
            disc / (silhouette_scale(soft, r) + 1e-12), -30.0, 30.0
        )
        w = 1.0 / (1.0 + jnp.exp(-xs))
        live_s = alive & hit
        we_mask = live_s & (smask > 0.0)
        if plane_mask is not None:
            we_mask = we_mask & ~plane_mask
        we = jnp.where(we_mask, w, 1.0)
        # Winner validity probability (round 5): V = P(t_raw beats the
        # t_min coin), the smoothed candidate gate.  Saturates to exactly
        # 1 for ordinary hits; the chain's PREVIOUS winner is hard-gated
        # in the scan (its V is {0,1}), close enough to the saturated
        # sigmoid that the weight-only difference is negligible.
        from .intersect import validity_scale

        v_w = 1.0 / (1.0 + jnp.exp(-jnp.clip(
            (t_raw_w - t_min) / (validity_scale(soft, r) + 1e-12),
            -30.0, 30.0)))
        ve = jnp.where(we_mask, v_w, 1.0)
        bval, bcx, bcy, bcz, brr = blocker
        ocbx, ocby, ocbz = bcx - ox, bcy - oy, bcz - oz
        tcb = ocbx * dx + ocby * dy + ocbz * dz
        ocb2 = ocbx * ocbx + ocby * ocby + ocbz * ocbz
        discb = brr * brr - (ocb2 - tcb * tcb)
        xsb = jnp.clip(
            discb / (silhouette_scale(soft, brr) + 1e-12), -30.0, 30.0
        )
        mb = 1.0 / (1.0 + jnp.exp(-xsb))
        # Would-be (clamped) hit t of the blocker strictly in front of the
        # winner (t_max on miss lanes, the true plane t on plane lanes),
        # and its validity probability.
        sqb = jnp.sqrt(jnp.maximum(discb, _DISC_EPS))
        tnb = tcb - sqb
        t_raw_b = jnp.where(tnb > t_min, tnb, tcb + sqb)
        t_b = jnp.maximum(t_raw_b, t_min)
        v_b = 1.0 / (1.0 + jnp.exp(-jnp.clip(
            (t_raw_b - t_min) / (validity_scale(soft, brr) + 1e-12),
            -30.0, 30.0)))
        blocker_on = bval & alive
        if plane4 is not None:
            # Stochastic plane-vs-sphere WINNER SELECT (round 5, opaque-
            # opaque intersection edges).  The blocker slot is dual-role on
            # plane scenes: a coin-REJECTED front sphere (the usual
            # blocking term) or the ACCEPTED sphere that lost the crossing
            # coin (stashed by the forward's plane_override).  The roles
            # are distinguished by replaying the blocker's acceptance AND
            # validity coins — bit-identical to the scan's tests.
            from .pallas_common import silhouette_logit_tile

            acc_b = discb > silhouette_logit_tile(u[7]) * silhouette_scale(
                soft, brr
            )
            valc_b = t_raw_b > t_min + silhouette_logit_tile(uv) * (
                validity_scale(soft, brr)
            )
            front_blk = blocker_on & ~(acc_b & valc_b)
        else:
            front_blk = blocker_on
        # Joint factor over the SHARED (u7, uv) coin pair:
        # p = We Ve - min(We, Wb) min(Ve, Vb)  — P(winner passes both and
        # the blocker fails at least one).
        fb = front_blk & (t_b < t)
        wb = jnp.where(fb, mb, 0.0)
        vb = jnp.where(fb, v_b, 1.0)
        blk_term = jnp.where(
            fb, jnp.minimum(we, wb) * jnp.minimum(ve, vb), 0.0
        )
        den = jnp.maximum(we * ve - blk_term, np.float32(SIL_P_FLOOR))
        if plane4 is not None:
            from .intersect import crossing_scale, grad_capped_sqrt

            pnx, pny, pnz, pk = plane4
            den4 = dx * pnx + dy * pny + dz * pnz
            t_pl4 = (-(ox * pnx + oy * pny + oz * pnz) - pk) / jnp.where(
                jnp.abs(den4) > 1e-8, den4, 1.0
            )
            pl_ok = (jnp.abs(den4) > 1e-8) & (t_pl4 > t_min) & (t_pl4 < t_max)
            # Sphere-win lanes: q = P(sphere beats plane), from the winner's
            # own capped-sqrt t (== ``t`` above under silhouette) and the
            # differentiable plane t (the offset cotangent rides it).
            sigx_w = crossing_scale(soft, r)
            q_s = 1.0 / (1.0 + jnp.exp(-jnp.clip(
                (t_pl4 - t) / (sigx_w + 1e-12), -30.0, 30.0)))
            qf = jnp.where(alive & hit & ~plane_mask & pl_ok, q_s, 1.0)
            # Plane-win lanes with a crossing-LOSER blocker: factor
            # P(plane wins vs that sphere) from its capped-sqrt would-be t.
            sqbx = grad_capped_sqrt(
                jnp.maximum(discb, _DISC_EPS), silhouette_scale(soft, brr)
            )
            tnbx = tcb - sqbx
            t_bx = jnp.maximum(
                jnp.where(tnbx > t_min, tnbx, tcb + sqbx), t_min
            )
            sigx_b = crossing_scale(soft, brr)
            q_p = 1.0 / (1.0 + jnp.exp(-jnp.clip(
                (t_bx - t) / (sigx_b + 1e-12), -30.0, 30.0)))
            cross_loser = blocker_on & acc_b & valc_b & plane_mask
            qf = jnp.where(cross_loser, q_p, qf)
            # Floor only (we - m): a logistic's score is bounded, and
            # flooring qf breaks the two-sided pair cancellation
            # (experiments/r5_crossing_fd.py).
            den = den * qf
        srat = den / jax.lax.stop_gradient(den)
        tr = tr * srat
        tg = tg * srat
        tb = tb * srat

    sdx, sdy, sdz, atr, atg, atb, scattered = scatter_tiles(
        dx, dy, dz, nx, ny, nz, mat, ar, ag, ab, fz, io, u,
        fresnel_score=silhouette is not None and _SIL_FRESNEL_ON(),
    )

    # Sky miss shader (materials.sky_color lerp).
    s01 = 0.5 * (dy + 1.0)
    skr = sky6[0] + (sky6[3] - sky6[0]) * s01
    skg = sky6[1] + (sky6[4] - sky6[1]) * s01
    skb = sky6[2] + (sky6[5] - sky6[2]) * s01
    miss_f = jnp.where(alive & ~hit, 1.0, 0.0)
    rad_r = tr * skr * miss_f
    rad_g = tg * skg * miss_f
    rad_b = tb * skb * miss_f

    live = alive & hit
    surv = live & scattered
    ntr = jnp.where(surv, tr * atr, tr)
    ntg = jnp.where(surv, tg * atg, tg)
    ntb = jnp.where(surv, tb * atb, tb)
    nox = jnp.where(live, px, ox)
    noy = jnp.where(live, py, oy)
    noz = jnp.where(live, pz, oz)
    # Directions use the pre-RR survival mask (render.py ordering).
    ndx = jnp.where(surv, sdx, dx)
    ndy = jnp.where(surv, sdy, dy)
    ndz = jnp.where(surv, sdz, dz)
    if rr_on:
        # Russian roulette on the UPDATED throughput (render.py): q is
        # differentiable (no stop_gradient in the jnp path either).
        q = jnp.clip(jnp.maximum(jnp.maximum(ntr, ntg), ntb), 0.05, 1.0)
        surv = surv & ~(do_rr & (u[6] >= q))
        boost = do_rr & surv
        ntr = jnp.where(boost, ntr / q, ntr)
        ntg = jnp.where(boost, ntg / q, ntg)
        ntb = jnp.where(boost, ntb / q, ntb)
    surv_f = jnp.where(surv, 1.0, 0.0)
    return (
        (nox, noy, noz), (ndx, ndy, ndz), (ntr, ntg, ntb),
        (rad_r, rad_g, rad_b), surv_f,
    )


def _grad_fwd_kernel(
    # SMEM scene tables + sky + meta
    cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
    albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    sky_ref, meta_ref, sil_ref,
    # VMEM ray state
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tr_ref, tg_ref, tb_ref, rr_ref, rg_ref, rb_ref,
    alive_ref, pprev_ref, pix_ref, samp_ref,
    # outputs: next state (13) + residuals (idx, attr9, mat)
    n_ox, n_oy, n_oz, n_dx, n_dy, n_dz,
    n_tr, n_tg, n_tb, n_rr, n_rg, n_rb, n_alive,
    o_idx, o_cx, o_cy, o_cz, o_r, o_ar, o_ag, o_ab, o_fz, o_io, o_mat,
    *rest,
    n_spheres: int, t_min: float, t_max: float, rr_start_depth: int,
    softness: float,
):
    tables = (
        cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
        albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    )
    alive = alive_ref[:] > 0.0
    shape = (_SUB, _LANE)
    soft = softness > 0.0
    if soft:
        # Blocker residuals (two-sided silhouette scheme, round 5) + the
        # previous-winner next-state plane (validity-coin hard gate).
        o_bidx, o_bcx, o_bcy, o_bcz, o_br, n_prev = rest
    else:
        (n_prev,) = rest

    def do_bounce():
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        k0, k1, bounce = meta_ref[0], meta_ref[1], meta_ref[2]
        u = _uniforms7(k0, k1, pix_ref[:], samp_ref[:], bounce)
        sil = blk = None
        if soft:
            c1b = samp_ref[:] << jnp.uint32(8)
            _, wuv = threefry2x32(
                k0, k1, pix_ref[:], c1b | (jnp.uint32(128) + bounce)
            )
            uv = to_unit_float(wuv)
            winner, (qi, qx, qy, qz, qr) = closest_hit_scan_soft(
                tables, ox, oy, oz, dx, dy, dz, u[7], uv, pprev_ref[:],
                sil_ref,
                n_spheres=n_spheres, t_min=t_min, t_max=t_max,
                softness=softness,
            )
            qi = jnp.where(alive, qi, -1)
            sil = (jnp.ones(shape, jnp.float32), softness)
            blk = (qi >= 0, qx, qy, qz, qr)
        else:
            winner = closest_hit_scan(
                tables, ox, oy, oz, dx, dy, dz,
                n_spheres=n_spheres, t_min=t_min, t_max=t_max,
            )
        (t_scan, bi, cx, cy, cz, r, ar, ag, ab, mat, fz, io) = winner
        del t_scan  # the state update recomputes t differentiably
        hit = bi >= 0
        do_rr = jnp.full(shape, bounce) >= jnp.uint32(rr_start_depth)
        sky6 = tuple(sky_ref[i] for i in range(6))
        a9 = (cx, cy, cz, r, ar, ag, ab, fz, io)
        (no3, nd3, ntp3, rad3, surv_f) = bounce_tile(
            (ox, oy, oz), (dx, dy, dz), (tr_ref[:], tg_ref[:], tb_ref[:]),
            a9, mat, hit, alive, u, sky6, do_rr,
            t_min=t_min, t_max=t_max, rr_on=bool(rr_start_depth),
            silhouette=sil, blocker=blk,
        )
        n_ox[:], n_oy[:], n_oz[:] = no3
        n_dx[:], n_dy[:], n_dz[:] = nd3
        n_tr[:], n_tg[:], n_tb[:] = ntp3
        n_rr[:] = rr_ref[:] + rad3[0]
        n_rg[:] = rg_ref[:] + rad3[1]
        n_rb[:] = rb_ref[:] + rad3[2]
        n_alive[:] = surv_f
        # Residuals.  idx is masked to -1 wherever this lane contributes no
        # table cotangent (dead or miss): the bucket kernel skips chunks
        # whose every idx is -1.
        o_idx[:] = jnp.where(alive & hit, bi, -1)
        o_cx[:], o_cy[:], o_cz[:], o_r[:] = cx, cy, cz, r
        o_ar[:], o_ag[:], o_ab[:] = ar, ag, ab
        o_fz[:], o_io[:] = fz, io
        o_mat[:] = mat
        n_prev[:] = jnp.where(alive & hit, bi, -1)
        if soft:
            o_bidx[:] = qi
            o_bcx[:], o_bcy[:], o_bcz[:], o_br[:] = qx, qy, qz, qr

    def skip():
        n_ox[:], n_oy[:], n_oz[:] = ox_ref[:], oy_ref[:], oz_ref[:]
        n_dx[:], n_dy[:], n_dz[:] = dx_ref[:], dy_ref[:], dz_ref[:]
        n_tr[:], n_tg[:], n_tb[:] = tr_ref[:], tg_ref[:], tb_ref[:]
        n_rr[:], n_rg[:], n_rb[:] = rr_ref[:], rg_ref[:], rb_ref[:]
        zero = jnp.zeros(shape, jnp.float32)
        n_alive[:] = zero
        n_prev[:] = pprev_ref[:]
        o_idx[:] = jnp.full(shape, -1, jnp.int32)
        o_cx[:] = zero
        o_cy[:] = zero
        o_cz[:] = zero
        o_r[:] = jnp.ones(shape, jnp.float32)
        o_ar[:] = zero
        o_ag[:] = zero
        o_ab[:] = zero
        o_fz[:] = zero
        o_io[:] = jnp.ones(shape, jnp.float32)
        o_mat[:] = jnp.zeros(shape, jnp.int32)
        if soft:
            o_bidx[:] = jnp.full(shape, -1, jnp.int32)
            o_bcx[:] = zero
            o_bcy[:] = zero
            o_bcz[:] = zero
            o_br[:] = jnp.ones(shape, jnp.float32)

    jax.lax.cond(jnp.any(alive), do_bounce, skip)


def _grad_bwd_kernel(
    # SMEM
    sky_ref, meta_ref,
    # VMEM residuals for this bounce
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tr_ref, tg_ref, tb_ref, alive_ref, idx_ref,
    cx_ref, cy_ref, cz_ref, r_ref, ar_ref, ag_ref, ab_ref,
    fz_ref, io_ref, mat_ref,
    pix_ref, samp_ref,
    # cotangents in: next-state (o, d, tp) + radiance (constant per ray)
    cox_ref, coy_ref, coz_ref, cdx_ref, cdy_ref, cdz_ref,
    ctr_ref, ctg_ref, ctb_ref, crr_ref, crg_ref, crb_ref,
    # then (soft only) 5 blocker residual inputs, then the outputs:
    # carried cotangents (9) + attr cotangents (9) + sky partials (6)
    # [+ 4 blocker-attr cotangents when soft]
    *rest,
    t_min: float, t_max: float, rr_start_depth: int, softness: float,
):
    shape = (_SUB, _LANE)
    soft = softness > 0.0
    if soft:
        (bq_idx, bq_cx, bq_cy, bq_cz, bq_r) = rest[:5]
        outs = rest[5:]
    else:
        outs = rest
    (b_ox, b_oy, b_oz, b_dx, b_dy, b_dz, b_tr, b_tg, b_tb,
     a_cx, a_cy, a_cz, a_r, a_ar, a_ag, a_ab, a_fz, a_io,
     s_lor, s_log, s_lob, s_hir, s_hig, s_hib) = outs[:24]
    if soft:
        (a_bcx, a_bcy, a_bcz, a_br) = outs[24:]
    sky_accs = (s_lor, s_log, s_lob, s_hir, s_hig, s_hib)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for s in sky_accs:
            s[:] = jnp.zeros(shape, jnp.float32)

    alive = alive_ref[:] > 0.0
    idxv = idx_ref[:]
    hit = idxv >= 0  # idx was masked by (alive & hit) in the forward

    def do_bwd():
        o3 = (ox_ref[:], oy_ref[:], oz_ref[:])
        d3 = (dx_ref[:], dy_ref[:], dz_ref[:])
        tp3 = (tr_ref[:], tg_ref[:], tb_ref[:])
        a9 = (
            cx_ref[:], cy_ref[:], cz_ref[:], r_ref[:],
            ar_ref[:], ag_ref[:], ab_ref[:], fz_ref[:], io_ref[:],
        )
        mat = mat_ref[:]
        k0, k1, bounce = meta_ref[0], meta_ref[1], meta_ref[2]
        u = _uniforms7(k0, k1, pix_ref[:], samp_ref[:], bounce)
        do_rr = jnp.full(shape, bounce) >= jnp.uint32(rr_start_depth)
        # Sky enters the vjp as BROADCAST TILES so its adjoint comes from
        # the same traced pullback as every other leaf (a manual
        # miss-shader-only accumulation once missed a blend term — the
        # round-4 combined-features test).
        skyt = tuple(jnp.full(shape, sky_ref[i]) for i in range(6))
        cts = (
            (cox_ref[:], coy_ref[:], coz_ref[:]),
            (cdx_ref[:], cdy_ref[:], cdz_ref[:]),
            (ctr_ref[:], ctg_ref[:], ctb_ref[:]),
            (crr_ref[:], crg_ref[:], crb_ref[:]),
        )
        if soft:
            sil = (jnp.ones(shape, jnp.float32), softness)
            bval = bq_idx[:] >= 0
            blk4 = (bq_cx[:], bq_cy[:], bq_cz[:], bq_r[:])

            def f(o3, d3, tp3, a9, sky6, blk4):
                return bounce_tile(
                    o3, d3, tp3, a9, mat, hit, alive, u, sky6, do_rr,
                    t_min=t_min, t_max=t_max, rr_on=bool(rr_start_depth),
                    silhouette=sil, blocker=(bval, *blk4),
                )[:4]

            _, pull = jax.vjp(f, o3, d3, tp3, a9, skyt, blk4)
            ct_o, ct_d, ct_tp, ct_a9, ct_sky, ct_blk = pull(cts)
            blk_outs = (a_bcx, a_bcy, a_bcz, a_br)
            for ref, ct in zip(blk_outs, ct_blk):
                ref[:] = jnp.where(bval, ct, 0.0)
        else:

            def f(o3, d3, tp3, a9, sky6):
                return bounce_tile(
                    o3, d3, tp3, a9, mat, hit, alive, u, sky6, do_rr,
                    t_min=t_min, t_max=t_max, rr_on=bool(rr_start_depth),
                )[:4]

            _, pull = jax.vjp(f, o3, d3, tp3, a9, skyt)
            ct_o, ct_d, ct_tp, ct_a9, ct_sky = pull(cts)
        b_ox[:], b_oy[:], b_oz[:] = ct_o
        b_dx[:], b_dy[:], b_dz[:] = ct_d
        b_tr[:], b_tg[:], b_tb[:] = ct_tp
        # Defensive mask: dead lanes get exactly-zero attr cotangents (their
        # chain is masked already; this also stops any 0*inf NaN from a
        # degenerate adjoint on an inert lane reaching the tables).
        attr_outs = (a_cx, a_cy, a_cz, a_r, a_ar, a_ag, a_ab, a_fz, a_io)
        for ref, ct in zip(attr_outs, ct_a9):
            ref[:] = jnp.where(hit, ct, 0.0)
        for c in range(6):
            sky_accs[c][:] = sky_accs[c][:] + ct_sky[c]

    def skip():
        # Fully-dead block: the bounce was the identity on (o, d, tp).
        b_ox[:], b_oy[:], b_oz[:] = cox_ref[:], coy_ref[:], coz_ref[:]
        b_dx[:], b_dy[:], b_dz[:] = cdx_ref[:], cdy_ref[:], cdz_ref[:]
        b_tr[:], b_tg[:], b_tb[:] = ctr_ref[:], ctg_ref[:], ctb_ref[:]
        zero = jnp.zeros(shape, jnp.float32)
        dead_outs = [a_cx, a_cy, a_cz, a_r, a_ar, a_ag, a_ab, a_fz, a_io]
        if soft:
            dead_outs += [a_bcx, a_bcy, a_bcz, a_br]
        for ref in dead_outs:
            ref[:] = zero

    jax.lax.cond(jnp.any(alive), do_bwd, skip)


def _cast_vma(x, vma):
    """Promote a fresh constant to the given varying-mesh-axes set (identity
    outside shard_map) — scan carries must match their body outputs' vma."""
    missing = vma - getattr(jax.typeof(x), "vma", frozenset())
    return jax.lax.pcast(x, tuple(missing), to="varying") if missing else x


def _pack_cols(a, n, pad_value=0.0):
    """[N]-ish column -> (rows, 128) tile array, padded to a 1024 multiple."""
    n_pad = -(-n // _BLOCK) * _BLOCK
    if n_pad != n:
        a = jnp.concatenate([a, jnp.full((n_pad - n,), pad_value, a.dtype)])
    return a.reshape(n_pad // _LANE, _LANE)


def _fused_radiance_tiles(ox, oy, oz, dx, dy, dz, alive0, pix, samp,
                          k0, k1, scene, config, n):
    """Shared tail: run the fused custom-vjp trace on packed tiles."""
    tables = (
        scene.centers[:, 0], scene.centers[:, 1], scene.centers[:, 2],
        scene.radii, jax.lax.stop_gradient(scene.radii * scene.radii),
        scene.albedo[:, 0], scene.albedo[:, 1], scene.albedo[:, 2],
        scene.material.astype(jnp.int32), scene.fuzz, scene.ior,
    )
    sky6 = jnp.concatenate([scene.sky_lo, scene.sky_hi]).astype(jnp.float32)

    rad3 = _fused_trace(
        ox, oy, oz, dx, dy, dz, alive0, pix, samp, k0, k1, tables, sky6,
        depth=int(config.max_depth), t_min=float(config.t_min),
        t_max=float(config.t_max),
        rr_start_depth=int(config.rr_start_depth),
        interpret=bool(config.pallas_interpret),
        softness=float(config.silhouette_softness),
    )
    return jnp.stack([r.reshape(-1)[:n] for r in rad3], axis=-1)


def trace_rays_fused(origins, dirs, keys, scene, config):
    """Differentiable whole-trace radiance via the fused Pallas fwd/bwd.

    Drop-in for render.trace_rays under jax.grad (config.use_pallas_grad):
    same radiance values as the jnp bounce (to fp tolerance), same gradient
    semantics (discrete hit/branch selection locally constant; t, normal,
    attenuation, throughput, sky differentiable), ~an order of magnitude
    faster fwd+bwd on a v5e chip.
    """
    n = origins.shape[0]
    ox = _pack_cols(origins[:, 0], n)
    oy = _pack_cols(origins[:, 1], n)
    oz = _pack_cols(origins[:, 2], n)
    dx = _pack_cols(dirs[:, 0], n)
    dy = _pack_cols(dirs[:, 1], n)
    # Padding lanes get dz=1 so direction math stays finite; alive=0 makes
    # them inert.
    dz = _pack_cols(dirs[:, 2], n, pad_value=1.0)
    alive0 = _pack_cols(jnp.ones((n,), jnp.float32), n)
    pix = _pack_cols(keys.pixel, n)
    samp = _pack_cols(keys.sample, n)
    return _fused_radiance_tiles(
        ox, oy, oz, dx, dy, dz, alive0, pix, samp,
        keys.k0, keys.k1, scene, config, n,
    )


def _raygen_kernel(
    cam_ref, meta_ref, pix_ref, samp_ref, xf_ref, yf_ref,
    o_ox, o_oy, o_oz, o_dx, o_dy, o_dz,
    *, width: int, height: int,
):
    """Camera rays on tiles: threefry jitter/lens draws (slots 124/125 of
    the shared slot map) + thin-lens math — matching ops/sampling
    .camera_jitter + camera.generate_rays like the persistent kernel."""
    k0, k1 = meta_ref[0], meta_ref[1]
    pix = pix_ref[:]
    c1b = samp_ref[:] << jnp.uint32(8)
    w0, w1 = threefry2x32(k0, k1, pix, c1b | jnp.uint32(124))
    jx, jy = to_unit_float(w0), to_unit_float(w1)
    w0, w1 = threefry2x32(k0, k1, pix, c1b | jnp.uint32(125))
    lu, lv = to_unit_float(w0), to_unit_float(w1)
    (o_ox[:], o_oy[:], o_oz[:], o_dx[:], o_dy[:], o_dz[:]) = camera_ray_tiles(
        cam_ref, xf_ref[:], yf_ref[:], jx, jy, lu, lv,
        width=width, height=height,
    )


def trace_pixels_fused(camera, keys, scene, config):
    """Fused trace with IN-KERNEL camera ray generation.

    The XLA-side ray setup (threefry jitter draws + camera math + packing
    transposes) measured ~35 ms fixed cost per 960k-ray dispatch — 40% of
    the fused forward.  This entry generates the rays with a raygen Pallas
    kernel instead (same slot map / camera constants as the persistent
    kernel, so values match generate_rays to fp tolerance) and feeds tiles
    straight into the fused trace.  Camera parameters are not
    differentiated on this path (the DIFF_LEAVES set does not include the
    camera; render.render_pixels falls back to trace_rays_fused when a
    differentiable camera or silhouette blend is requested).
    """
    n = keys.pixel.shape[0]
    pix = _pack_cols(keys.pixel, n)
    samp = _pack_cols(keys.sample, n)
    alive0 = _pack_cols(jnp.ones((n,), jnp.float32), n)
    ox, oy, oz, dx, dy, dz = raygen_tiles(camera, keys, config)
    return _fused_radiance_tiles(
        ox, oy, oz, dx, dy, dz, alive0, pix, samp,
        keys.k0, keys.k1, scene, config, n,
    )


def raygen_tiles(camera, keys, config):
    """Camera rays as six (rows, 128) tiles via the raygen kernel.

    Equivalence-tested against camera_jitter + generate_rays
    (tests/test_pallas_grad.py).  Outputs are stop_gradient'ed: the
    pallas_call has no VJP, and the camera is not a differentiable leaf.
    """
    n = keys.pixel.shape[0]
    pix = _pack_cols(keys.pixel, n)
    samp = _pack_cols(keys.sample, n)
    w = jnp.uint32(config.width)
    xf = _pack_cols((keys.pixel % w).astype(jnp.float32), n)
    yf = _pack_cols((keys.pixel // w).astype(jnp.float32), n)

    from .pallas_persistent import camera_constants

    cam19 = jax.lax.stop_gradient(
        camera_constants(camera, config.width, config.height)
    )
    meta2 = jnp.stack([keys.k0, keys.k1]).astype(jnp.uint32)
    rows = pix.shape[0]
    blk = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vma = vma_union(pix, samp, keys.k0, keys.k1, cam19)
    f32out = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32, vma=vma)
    rays = pl.pallas_call(
        functools.partial(
            _raygen_kernel, width=int(config.width), height=int(config.height)
        ),
        grid=(rows // _SUB,),
        in_specs=[smem, smem] + [blk] * 4,
        out_specs=tuple([blk] * 6),
        out_shape=(f32out,) * 6,
        cost_estimate=pl.CostEstimate(
            flops=300 * rows * _LANE,
            bytes_accessed=10 * 4 * rows * _LANE,
            transcendentals=4 * rows * _LANE,
        ),
        interpret=bool(config.pallas_interpret),
    )(cam19, meta2, pix.astype(jnp.uint32), samp.astype(jnp.uint32), xf, yf)
    return tuple(jax.lax.stop_gradient(r) for r in rays)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18)
)
def _fused_trace(
    ox, oy, oz, dx, dy, dz, alive0, pix, samp, k0, k1, tables, sky6,
    depth, t_min, t_max, rr_start_depth, interpret, softness=0.0,
):
    rad3, _ = _fused_fwd_impl(
        ox, oy, oz, dx, dy, dz, alive0, pix, samp, k0, k1, tables, sky6,
        depth, t_min, t_max, rr_start_depth, interpret, softness,
    )
    return rad3


def _fused_fwd_impl(
    ox, oy, oz, dx, dy, dz, alive0, pix, samp, k0, k1, tables, sky6,
    depth, t_min, t_max, rr_start_depth, interpret, softness=0.0,
):
    rows = ox.shape[0]
    tables = pad_scene_tables(tables)
    s_pad = tables[0].shape[0]
    pix_u = pix.astype(jnp.uint32)
    samp_u = samp.astype(jnp.uint32)
    k0u = jnp.asarray(k0, jnp.uint32)
    k1u = jnp.asarray(k1, jnp.uint32)

    kernel = functools.partial(
        _grad_fwd_kernel, n_spheres=s_pad, t_min=t_min, t_max=t_max,
        rr_start_depth=rr_start_depth, softness=softness,
    )
    blk = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vma = vma_union(ox, dy, alive0, pix, samp, k0, k1, *tables, sky6)
    f32out = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32, vma=vma)
    i32out = jax.ShapeDtypeStruct((rows, _LANE), jnp.int32, vma=vma)

    zero = ox * 0.0
    one = zero + 1.0
    prev0 = (zero).astype(jnp.int32) - 1
    state0 = tuple(
        _cast_vma(s, vma)
        for s in (ox, oy, oz, dx, dy, dz, one, one, one, zero, zero, zero,
                  alive0, prev0)
    )

    soft = softness > 0.0
    # Soft-scan SMEM aux (per-sphere band scales, soft_scan_tables); tiny
    # dummy when hard so the kernel arity is static.
    sil2 = (
        soft_scan_tables(tables, softness) if soft
        else jnp.zeros((4,), jnp.float32)
    )
    n_out = 30 if soft else 25
    out_shapes = (f32out,) * 13 + (i32out,) + (f32out,) * 9 + (i32out,)
    if soft:
        out_shapes = out_shapes + (i32out,) + (f32out,) * 4
    out_shapes = out_shapes + (i32out,)  # n_prev (last)

    def body(st, b):
        meta3 = jnp.stack([k0u, k1u, b]).astype(jnp.uint32)
        outs = pl.pallas_call(
            kernel,
            grid=(rows // _SUB,),
            in_specs=[smem] * 14 + [blk] * 16,
            out_specs=tuple([blk] * n_out),
            out_shape=out_shapes,
            cost_estimate=pl.CostEstimate(
                flops=35 * rows * _LANE * s_pad,
                bytes_accessed=52 * 4 * rows * _LANE,
                transcendentals=8 * rows * _LANE,
            ),
            interpret=interpret,
        )(*tables, sky6, meta3, sil2, *st, pix_u, samp_u)
        nxt = tuple(outs[:13]) + (outs[-1],)
        resid = (st[0], st[1], st[2], st[3], st[4], st[5],
                 st[6], st[7], st[8], st[12],
                 outs[13], *outs[14:23], outs[23], *outs[24:-1])
        return nxt, resid

    final, resids = jax.lax.scan(
        body, state0, jnp.arange(depth, dtype=jnp.uint32)
    )
    rad3 = (final[9], final[10], final[11])
    res = (resids, pix_u, samp_u, k0u, k1u, sky6)
    return rad3, res


def _fused_fwd_rule(
    ox, oy, oz, dx, dy, dz, alive0, pix, samp, k0, k1, tables, sky6,
    depth, t_min, t_max, rr_start_depth, interpret, softness=0.0,
):
    rad3, res = _fused_fwd_impl(
        ox, oy, oz, dx, dy, dz, alive0, pix, samp, k0, k1, tables, sky6,
        depth, t_min, t_max, rr_start_depth, interpret, softness,
    )
    s_real = tables[0].shape[0]
    return rad3, (res, s_real)


def _fused_bwd_rule(depth, t_min, t_max, rr_start_depth, interpret,
                    softness, resaux, ct):
    from .pallas_bucket import bucket_cols_pallas

    (resids, pix_u, samp_u, k0u, k1u, sky6), s_real = resaux
    ctr, ctg, ctb = ct
    rows = ctr.shape[0]
    s_pad = -(-s_real // 16) * 16  # pad_scene_tables multiple

    kernel = functools.partial(
        _grad_bwd_kernel, t_min=t_min, t_max=t_max,
        rr_start_depth=rr_start_depth, softness=softness,
    )
    blk = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    pinned = pl.BlockSpec((_SUB, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vma = vma_union(ctr, pix_u, samp_u, k0u, k1u, sky6, *jax.tree.leaves(resids))
    f32out = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32, vma=vma)
    sky_out = jax.ShapeDtypeStruct((_SUB, _LANE), jnp.float32, vma=vma)

    soft = softness > 0.0
    n_in = 40 if soft else 35
    n_fout = 22 if soft else 18
    zero = ctr * 0.0
    carry0 = (
        (zero, zero, zero), (zero, zero, zero), (zero, zero, zero),
        _cast_vma(jnp.zeros((s_pad, 9), jnp.float32), vma),
        tuple(_cast_vma(jnp.zeros((_SUB, _LANE), jnp.float32), vma)
              for _ in range(6)),
    )

    def body(carry, xs):
        (cto, ctd, cttp, d_tab, sky_acc) = carry
        resid, b = xs
        blk5 = resid[21:]   # (bidx, bcx, bcy, bcz, br) under the soft scheme
        meta3 = jnp.stack([k0u, k1u, b]).astype(jnp.uint32)
        outs = pl.pallas_call(
            kernel,
            grid=(rows // _SUB,),
            in_specs=[smem] * 2 + [blk] * n_in,
            out_specs=tuple([blk] * 18) + tuple([pinned] * 6)
            + tuple([blk] * (n_fout - 18)),
            out_shape=(f32out,) * 18 + (sky_out,) * 6 + (f32out,) * (n_fout - 18),
            cost_estimate=pl.CostEstimate(
                flops=400 * rows * _LANE,
                bytes_accessed=58 * 4 * rows * _LANE,
                transcendentals=16 * rows * _LANE,
            ),
            interpret=interpret,
        )(
            sky6, meta3, *resid[:21], pix_u, samp_u,
            *cto, *ctd, *cttp, ctr, ctg, ctb, *blk5,
        )
        ncto = tuple(outs[0:3])
        nctd = tuple(outs[3:6])
        ncttp = tuple(outs[6:9])
        cta9 = outs[9:18]
        sky_part = outs[18:24]
        idx = resid[10]
        d_tab = d_tab + bucket_cols_pallas(
            cta9, idx, s_pad, interpret=interpret
        )
        if soft:
            # Blocker-attr cotangents bucket into the same table rows
            # (cx, cy, cz, r columns) by blocker index.
            ct_blk = outs[24:28]
            d_tab = d_tab + bucket_cols_pallas(
                ct_blk + (zero,) * 5, blk5[0], s_pad, interpret=interpret
            )
        sky_acc = tuple(a + p for a, p in zip(sky_acc, sky_part))
        return (ncto, nctd, ncttp, d_tab, sky_acc), None

    (cto, ctd, cttp, d_tab, sky_acc), _ = jax.lax.scan(
        body, carry0, (resids, jnp.arange(depth, dtype=jnp.uint32)),
        reverse=True,
    )
    d_tab = d_tab[:s_real]
    d_sky6 = jnp.stack([jnp.sum(a) for a in sky_acc])

    def f0(x):
        return np.zeros(x.shape, jax.dtypes.float0)

    d_tables = (
        d_tab[:, 0], d_tab[:, 1], d_tab[:, 2], d_tab[:, 3],
        d_tab[:, 3] * 0.0,            # r2 (scan-only, detached)
        d_tab[:, 4], d_tab[:, 5], d_tab[:, 6],
        np.zeros((s_real,), jax.dtypes.float0),   # material (int)
        d_tab[:, 7], d_tab[:, 8],
    )
    return (
        cto[0], cto[1], cto[2], ctd[0], ctd[1], ctd[2],
        jnp.zeros_like(ctr),           # alive0
        f0(pix_u), f0(samp_u), f0(k0u), f0(k1u),
        d_tables, d_sky6,
    )


_fused_trace.defvjp(_fused_fwd_rule, _fused_bwd_rule)
