"""The wavefront megakernel: batched masked path tracing under ``lax.scan``.

Design (SURVEY.md S7): the reference forks into a recursive megakernel
(include/SingleThreadPathTracer.hpp:94-137) and a material-binned wavefront
with compaction queues (include/TaskBasedPathTracer.hpp:54-206).  On TPU the
right shape is a single *uniform* wavefront — every live ray advances one
bounce per ``lax.scan`` step, materials resolved with masked selects, dead
rays masked rather than compacted (uniform control flow beats queues on a
vector machine).  The reference's unbounded specular recursion
(SingleThreadPathTracer.hpp:45,63 never decrement bounceCount) becomes a
fixed ``max_depth`` budget for every material.

Each bounce body is wrapped in ``jax.checkpoint`` so the backward pass of a
``max_depth``-step scan rematerializes per bounce instead of storing all
[N, S] intersection intermediates (SURVEY.md S7 hard part 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .camera import generate_rays
from .ops.intersect import intersect_scene, intersect_scene_soft
from .ops.materials import scatter, sky_color
from .ops.sampling import bounce_noise, camera_jitter, ray_keys
from .ops.table_gather import pack_tables
from .types import Camera, RenderConfig, RenderState, Scene


def _vary_like(xs, refs):
    """Cast fresh constants to the union of the refs' varying manual axes.

    Under ``shard_map`` a ``lax.scan`` carry must have the same vma set as the
    body's output; constants created inside the body are unvarying while
    values derived from sharded inputs are varying, so scan inits built from
    ``jnp.zeros``/``ones`` need an explicit ``pcast``.  Outside shard_map this
    is the identity.
    """
    vma = frozenset()
    for r in jax.tree.leaves(refs):
        vma |= getattr(jax.typeof(r), "vma", frozenset())
    if not vma:
        return xs
    return jax.tree.map(lambda x: jax.lax.pcast(x, tuple(vma), to="varying"), xs)


def trace_rays_pallas(origins, dirs, keys, scene: Scene, config: RenderConfig):
    """Forward-only fast path: the whole bounce runs in one Pallas megakernel
    per scan step (ops/pallas_bounce.py) on SoA (8, 128) ray tiles.

    Matches trace_rays to fp tolerance (identical threefry streams, same
    material math) but is NOT differentiable — gradient paths use the jnp
    bounce below.
    """
    from .ops.pallas_bounce import bounce_step_pallas

    n = origins.shape[0]
    n_pad = -(-n // 1024) * 1024
    pad = n_pad - n
    rows = n_pad // 128

    def pack(col, fill=0.0):
        if pad:
            col = jnp.concatenate([col, jnp.full((pad,), fill, col.dtype)])
        return col.reshape(rows, 128)

    zeros = jnp.zeros((rows, 128), jnp.float32)
    ones = jnp.ones((rows, 128), jnp.float32)
    state = (
        pack(origins[:, 0]), pack(origins[:, 1]), pack(origins[:, 2]),
        pack(dirs[:, 0]), pack(dirs[:, 1]), pack(dirs[:, 2]),
        ones, ones, ones,            # throughput rgb
        zeros, zeros, zeros,         # radiance rgb
        pack(jnp.ones((n,), jnp.float32), 0.0),   # alive (padding dead)
    )
    state = _vary_like(state, (origins, dirs, keys))
    pix = pack(keys.pixel)
    samp = pack(keys.sample)
    tables = (
        scene.centers[:, 0], scene.centers[:, 1], scene.centers[:, 2],
        scene.radii, scene.radii * scene.radii,
        scene.albedo[:, 0], scene.albedo[:, 1], scene.albedo[:, 2],
        scene.material.astype(jnp.int32), scene.fuzz, scene.ior,
    )
    sky6 = jnp.concatenate([scene.sky_lo, scene.sky_hi]).astype(jnp.float32)

    def body(st, b):
        meta = jnp.stack([keys.k0, keys.k1, b]).astype(jnp.uint32)
        out = bounce_step_pallas(
            st + (pix, samp), tables, sky6, meta,
            t_min=config.t_min, t_max=config.t_max,
            rr_start_depth=config.rr_start_depth,
            interpret=config.pallas_interpret, plane7=scene.plane,
        )
        return tuple(out), None

    state, _ = jax.lax.scan(
        body, state, jnp.arange(config.max_depth, dtype=jnp.uint32)
    )
    rr, rg, rb = state[9], state[10], state[11]
    return jnp.stack(
        [rr.reshape(-1)[:n], rg.reshape(-1)[:n], rb.reshape(-1)[:n]], axis=-1
    )


# Rays differentiated per rematerialized spp chunk (~1.7 GB of fused-path
# residuals at depth 10) — see grad_safe_config.
_GRAD_RAY_BUDGET = 2_000_000
# Lane-iterations (spp * pixels * max_depth) per chunk for the REGEN
# gradient kernels: their residuals are per-iteration, 136 B each (25 fwd
# planes + 9 bwd cotangent planes), so 48M iterations ≈ 6.5 GB — and the
# kernels' fixed costs amortize with chunk size (measured 12.1 -> 13.6
# -> 14.3 Mpaths/s sustained at bench-scale chunks 2/5/10,
# experiments/regen_sustained_bench.py; 48M picks chunk 5, one step back
# from the HBM ceiling chunk 10 would sit at).
_GRAD_ITER_BUDGET_REGEN = 48_000_000
# idx-plane bytes the streamed-idx gradient path may keep across ALL spp
# (render_pixel_block): 6 GB leaves headroom for one chunk's 25 residual +
# 9 cotangent planes (~6.5 GB at the default chunk) on a 15.75 GB v5e.
# Since round 4 the planes pack 3 winner indices per i32 word (10 bits
# each, ops/pallas_grad_regen._IDX_PACK), so the spp this budget covers is
# 3x round 3's: ~500 spp at the 1200x800@depth-10 bench shape — the
# BASELINE 500-spp north-star workload runs streamed, no fallback.
_IDX_PLANE_BUDGET = 6 << 30


def stream_capacity_spp(config: RenderConfig, scene) -> int:
    """Largest spp whose packed idx planes fit the streamed-gradient
    budget for this (config, scene) — the same gate render_pixel_block
    applies.  0 when the scene can't stream at all (sphere table too
    large for the 10-bit pack)."""
    from .ops.pallas_grad_regen import IDX_PACK_MAX_SPHERES, _IDX_PACK

    if scene.num_spheres > IDX_PACK_MAX_SPHERES:
        return 0
    planes = 2 if config.silhouette_softness > 0.0 else 1
    per_spp = planes * 4 * config.num_pixels * max(1, config.max_depth)
    return int(_IDX_PACK * _IDX_PLANE_BUDGET // per_spp)


# Debug-only trace-time switches for decomposing the soft-silhouette
# gradient (experiments use these; always empty in production).
_SIL_DBG: frozenset = frozenset()


def grad_safe_config(config: RenderConfig) -> RenderConfig:
    """Downgrade a config for use under ``jax.grad``.

    The persistent/bounce Pallas kernels are forward-only (project
    invariant: gradients use the jnp bounce), so every gradient entry point
    must clear ``use_pallas``.  The TPU acceleration that IS
    differentiable — the detached Pallas closest-hit with [N]-sized
    reconstruction — is enabled in its place: a preset tuned for fast
    forward rendering (use_pallas=True) keeps its speed intent on the
    gradient path instead of crashing deep inside shard_map.

    On kernel backends the regeneration kernels (grad_regen) are the
    default gradient path; since round 4 they cover every scene class
    (plane scenes and soft silhouettes included), so the per-bounce fused
    kernels remain only as the A/B baseline and the explicit-ray
    trace_rays entry.

    Also bounds the differentiated rays per chunk: the backward pass keeps
    per-(ray, bounce) residuals alive (regen path: 136 B per lane
    iteration; per-bounce fused path: 21 f32 tiles per ray per bounce
    ≈ 840 MB per bench-scale spp), so a preset-sized spp rendered in one
    monolithic batch would OOM the chip under value_and_grad.  If the user
    set no spp_chunk, pick one that keeps a chunk's work near the path's
    budget (render_pixel_block remats each chunk, so total residual memory
    is one chunk's worth).
    """
    if config.use_pallas:
        # The gradient kernels need real TPU hardware (or interpret mode) —
        # on CPU without interpret, fall back to the pure-jnp bounce.
        on_kernel_backend = (
            config.pallas_interpret or jax.default_backend() == "tpu"
        )
        config = config.replace(
            use_pallas=False,
            use_pallas_grad=config.use_pallas_grad or on_kernel_backend,
            use_pallas_hits=config.use_pallas_hits or on_kernel_backend,
            # Regeneration kernels are the production TPU gradient path
            # (2x the per-bounce fused path at bench scale, BENCH_r03/r04)
            # and cover every scene class since round 4.
            grad_regen=config.grad_regen or on_kernel_backend,
        )
    if config.spp_chunk == 0:
        if config.use_pallas_grad and config.grad_regen:
            max_chunk = _GRAD_ITER_BUDGET_REGEN // (
                config.num_pixels * max(1, config.max_depth)
            )
        else:
            max_chunk = _GRAD_RAY_BUDGET // config.num_pixels
        max_chunk = max(1, max_chunk)
        if config.spp > max_chunk:
            config = config.replace(spp_chunk=max_chunk)
    return config


def trace_rays(origins, dirs, keys, scene: Scene, config: RenderConfig):
    """Trace a batch of rays to completion. Returns radiance [N, 3].

    The bounce loop is the TPU form of TraceAndSampleColor
    (SingleThreadPathTracer.hpp:94-112): closest hit -> material scatter ->
    throughput update, with the sky gradient as the miss shader and a live
    mask instead of early returns.
    """
    if config.use_pallas:
        return trace_rays_pallas(origins, dirs, keys, scene, config)

    if scene.plane is not None and (config.use_pallas_grad or config.use_pallas_hits):
        # The fused/hits GRADIENT kernels are sphere-only; plane scenes take
        # the jnp bounce below (still differentiable w.r.t. every
        # DIFF_LEAVES member).  Forward kernels above DO trace the plane.
        config = config.replace(use_pallas_grad=False, use_pallas_hits=False)

    if config.silhouette_softness > 0.0 and config.use_pallas_hits:
        # The detached closest-hit kernel has no stochastic-transparency
        # scan (winner + blocker); soft configs take the jnp scan below or
        # the fused/regen kernels (which do).
        config = config.replace(use_pallas_hits=False)

    if config.use_pallas_grad:
        # Fully-fused differentiable path: forward AND backward bounce run
        # as Pallas kernels (ops/pallas_grad.py) — same gradient semantics
        # as the jnp bounce below, ~an order of magnitude faster fwd+bwd.
        from .ops.pallas_grad import trace_rays_fused

        return trace_rays_fused(origins, dirs, keys, scene, config)

    if config.use_pallas_hits:
        attr9 = pack_tables(scene)
        sg0 = jax.lax.stop_gradient
        sg_tables = (
            sg0(scene.centers[:, 0]), sg0(scene.centers[:, 1]),
            sg0(scene.centers[:, 2]), sg0(scene.radii),
            sg0(scene.radii * scene.radii),
            sg0(scene.albedo[:, 0]), sg0(scene.albedo[:, 1]),
            sg0(scene.albedo[:, 2]), scene.material.astype(jnp.int32),
            sg0(scene.fuzz), sg0(scene.ior),
        )
    else:
        attr9 = sg_tables = None

    def bounce(carry, b):
        o, d, tp, rad, alive, prev = carry
        wc3 = wr = pw_mask = blk = ph_t = cross_valid = widx = None
        unif = bounce_noise(keys, b)
        if config.use_pallas_hits:
            # Gradient fast path: the closest-hit kernel returns the winner
            # index AND its attributes (selected inline during the scan), so
            # the jnp glue does ZERO [N]-sized table gathers — XLA's TPU
            # gather ran at ~30 M elem/s and made the glue 10x the physics.
            # attach_attr_columns reattaches d(table): its backward
            # bucket-accumulates cotangents with MXU one-hot matmuls
            # (ops/table_gather.py) instead of XLA's serialized scatter-add
            # — together these close the round-1 40x fwd/bwd gap.
            from .ops.intersect import hit_from_gathered
            from .ops.materials import scatter_attrs
            from .ops.pallas_intersect import closest_hit_attrs_pallas
            from .ops.table_gather import attach_attr_columns

            sg = jax.lax.stop_gradient
            idx, attr_vals, mat = closest_hit_attrs_pallas(
                sg(o), sg(d), alive, sg_tables,
                t_min=config.t_min, t_max=config.t_max,
                interpret=config.pallas_interpret,
            )
            hit_mask = idx >= 0
            i = jnp.maximum(idx, 0)
            # attach gets the -1-MASKED idx: the bucket kernel skips chunks
            # whose every idx is -1 (late-bounce dead tiles), and a -1 row
            # matches no one-hot lane so its exactly-zero cotangent buckets
            # nowhere.  The clamped ``i`` is only for the forward-side hit
            # reconstruction below.
            cx, cy, cz, r, ar, ag, ab, fz, io = attach_attr_columns(
                config.pallas_interpret, attr9, idx, *attr_vals
            )
            wc3, wr = jnp.stack([cx, cy, cz], -1), r
            hit = hit_from_gathered(
                o, d, i, hit_mask, wc3, r, config.t_min, config.t_max,
            )
            new_d, att, scattered = scatter_attrs(
                d, hit.normal, mat, jnp.stack([ar, ag, ab], -1), fz, io, unif,
            )
        elif scene.plane is None:
            if config.silhouette_softness > 0.0:
                # Two-sided soft silhouettes (round 5): stochastic-
                # transparency closest hit — a shared coin decides sphere
                # acceptance by silhouette opacity, and the strongest
                # REJECTED front sphere (the blocker) is tracked for the
                # detached probability ratio below.
                from .ops.sampling import crossing_noise

                _, uvw = crossing_noise(keys, b)
                hit, blk = intersect_scene_soft(
                    o, d, unif[:, 7], uvw, scene, config.t_min, config.t_max,
                    config.silhouette_softness, prev_idx=prev,
                )
                wc3 = scene.centers[hit.index]
                wr = scene.radii[hit.index]
                widx = jnp.where(hit.hit, hit.index, -1)
            else:
                hit = intersect_scene(o, d, scene, config.t_min, config.t_max)
            from .ops import intersect as _I

            new_d, att, scattered = scatter(
                d, hit, scene, unif,
                fresnel_score=(
                    config.silhouette_softness > 0.0 and _I.SIL_FRESNEL
                ),
            )
        else:
            # Sphere scan + Lambertian ground-plane candidate (the
            # reference's dead Collision.hpp:73-85, live here).  Where the
            # plane is nearer, the winner's point/normal/attributes are
            # overridden; sphere-table cotangents are blocked by the selects
            # on plane-win lanes (their gathered values are unused).
            from .ops.materials import scatter_attrs
            from .ops.plane import ray_plane_intersection

            if config.silhouette_softness > 0.0:
                from .ops.sampling import crossing_noise

                uxw, uvw = crossing_noise(keys, b)
                hit, blk = intersect_scene_soft(
                    o, d, unif[:, 7], uvw, scene, config.t_min, config.t_max,
                    config.silhouette_softness, prev_idx=prev,
                )
            else:
                hit = intersect_scene(o, d, scene, config.t_min, config.t_max)
            # The plane normal is unit-constrained and NOT a differentiable
            # parameter (offset + albedo are) — detached here to match the
            # kernel gradient paths.
            ph = ray_plane_intersection(
                o, d, jax.lax.stop_gradient(scene.plane[:3]), scene.plane[3],
                config.t_min, config.t_max,
            )
            if config.silhouette_softness > 0.0:
                # Stochastic WINNER SELECT at the plane-vs-sphere t-crossing
                # (round 5): where both candidates are solid the acceptance
                # coin can't see the edge (opacities saturate), so the
                # nearest-wins compare itself gets a coin — the sphere beats
                # the plane iff t_s < t_p + logit(ux) * sigma_x(r), i.e.
                # P(sphere wins) = sigmoid((t_p - t_s) / sigma_x).  The
                # realized outcome's probability joins the detached ratio
                # below, carrying the intersection-circle edge gradient
                # dq * (L_sphere - L_plane) no smoothing estimator reaches.
                from .ops.intersect import crossing_scale, silhouette_logit

                sg = jax.lax.stop_gradient
                thr_x = silhouette_logit(uxw) * crossing_scale(
                    config.silhouette_softness, sg(scene.radii[hit.index])
                )
                pw = ph.hit & ~(hit.hit & (hit.t < ph.t + thr_x))
                ph_t = ph.t
                cross_valid = ph.hit & hit.hit
            else:
                pw = ph.hit & (ph.t < hit.t)
            from .ops.intersect import Hit

            hit = Hit(
                t=jnp.where(pw, ph.t, hit.t),
                index=hit.index,
                hit=hit.hit | pw,
                point=jnp.where(pw[:, None], ph.point, hit.point),
                normal=jnp.where(pw[:, None], ph.normal, hit.normal),
            )
            i = hit.index
            mat = jnp.where(pw, 0, scene.material[i])
            alb = jnp.where(pw[:, None], scene.plane[None, 4:7], scene.albedo[i])
            fz = jnp.where(pw, 0.0, scene.fuzz[i])
            io = jnp.where(pw, 1.0, scene.ior[i])
            from .ops import intersect as _I

            new_d, att, scattered = scatter_attrs(
                d, hit.normal, mat, alb, fz, io, unif,
                fresnel_score=(
                    config.silhouette_softness > 0.0 and _I.SIL_FRESNEL
                ),
            )
            if config.silhouette_softness > 0.0:
                # Plane wins have no silhouette term (pw_mask excludes them).
                wc3 = scene.centers[i]
                wr = scene.radii[i]
                pw_mask = pw
                widx = jnp.where(hit.hit & ~pw, hit.index, -1)

        if config.silhouette_softness > 0.0:
            # Two-sided silhouette gradients (round 5): the realized scan
            # outcome's probability is p = We - M (We = winner opacity, 1
            # on miss/plane lanes; M = strongest rejected front blocker's
            # opacity, 0 if none).  Scaling ALL of this bounce's radiance
            # (miss shader included) and the carried throughput by the
            # detached ratio s = p / stop_grad(p) == 1 leaves every value
            # unchanged while its vjp contributes L * d log p — the exact
            # REINFORCE visibility gradient dw * (L_front - L_behind) in
            # expectation.  The round-4 one-sided blend measured AD/FD =
            # 0.49 on geometry leaves because it dropped the L_behind side.
            # Formula shared with ops/pallas_grad.bounce_tile.
            from .ops.intersect import silhouette_scale

            soft = config.silhouette_softness
            oc = wc3 - o
            tcw = jnp.sum(oc * d, -1)
            discw = wr * wr - (jnp.sum(oc * oc, -1) - tcw * tcw)
            xsw = jnp.clip(
                discw / (silhouette_scale(soft, wr) + 1e-12), -30.0, 30.0
            )
            from .ops.intersect import grad_capped_sqrt, validity_scale

            sphere_win = alive & hit.hit
            if pw_mask is not None:
                sphere_win = sphere_win & ~pw_mask
            we = jnp.where(sphere_win, 1.0 / (1.0 + jnp.exp(-xsw)), 1.0)
            # Winner validity probability (round 5): V = P(t_raw beats the
            # t_min coin) — the smoothed candidate gate (see
            # intersect_scene_soft).  Recomputed differentiably from the
            # winner attributes; the realized t used everywhere is the
            # CLAMPED max(t_raw, t_min).
            sqw = grad_capped_sqrt(
                jnp.maximum(discw, 1e-12), silhouette_scale(soft, wr)
            )
            tnw = tcw - sqw
            t_raw_w = jnp.where(tnw > config.t_min, tnw, tcw + sqw)
            v_w = jax.nn.sigmoid(jnp.clip(
                (t_raw_w - config.t_min) / (validity_scale(soft, wr) + 1e-12),
                -30.0, 30.0,
            ))
            ve = jnp.where(sphere_win, v_w, 1.0)
            bi = jnp.maximum(blk, 0)
            bc = scene.centers[bi]
            brr = scene.radii[bi]
            ocb = bc - o
            tcb = jnp.sum(ocb * d, -1)
            discb = brr * brr - (jnp.sum(ocb * ocb, -1) - tcb * tcb)
            xsb = jnp.clip(
                discb / (silhouette_scale(soft, brr) + 1e-12), -30.0, 30.0
            )
            # Blocker probabilities: recorded, live lane, and its would-be
            # (clamped) hit t strictly in front of the FINAL winner.  With
            # the validity coin the blocker may have failed EITHER coin;
            # the joint factor over the SHARED (u7, uv) pair is
            #   p = We Ve - min(We, Wb) min(Ve, Vb)
            # (P(winner passes both and blocker fails at least one)).
            sqb = jnp.sqrt(jnp.maximum(discb, 1e-12))
            tnb = tcb - sqb
            t_raw_b = jnp.where(tnb > config.t_min, tnb, tcb + sqb)
            t_b = jnp.maximum(t_raw_b, config.t_min)
            v_b = jax.nn.sigmoid(jnp.clip(
                (t_raw_b - config.t_min)
                / (validity_scale(soft, brr) + 1e-12),
                -30.0, 30.0,
            ))
            bvalid = (blk >= 0) & alive & (t_b < hit.t)
            wb = jnp.where(bvalid, 1.0 / (1.0 + jnp.exp(-xsb)), 0.0)
            vb = jnp.where(bvalid, v_b, 1.0)
            # The floor caps the REINFORCE weight |d p| / p on near-
            # impossible outcomes (variance control; grad is 0 below it).
            from .ops.intersect import SIL_P_FLOOR

            if "sg_wm" in _SIL_DBG:
                we, wb, ve, vb = jax.lax.stop_gradient((we, wb, ve, vb))
            blk_term = jnp.where(
                bvalid, jnp.minimum(we, wb) * jnp.minimum(ve, vb), 0.0
            )
            if ph_t is not None:
                # Crossing factor (see the stochastic winner select above):
                # q = P(sphere wins) from the DIFFERENTIABLE t's — t_w via
                # the same value-exact capped sqrt as the bounce, t_p via
                # ray_plane_intersection (the plane offset's cotangent rides
                # it).  Saturates to exactly 1 outside the band (f32
                # sigmoid(+-30)); phantom-winner double-edges keep only the
                # crossing term (their We is handled on sphere-win lanes
                # only — documented single-competitor approximation).
                from .ops.intersect import crossing_scale

                t_w = jnp.maximum(t_raw_w, config.t_min)
                sigx = crossing_scale(soft, wr)
                qx = jax.nn.sigmoid(
                    jnp.clip((ph_t - t_w) / (sigx + 1e-12), -30.0, 30.0)
                )
                # Kernel-matching single-slot semantics: where the plane
                # stochastically beat an IN-BAND accepted sphere, the
                # kernels stash that crossing loser in the (single) blocker
                # slot, dropping any front blocker — do the same here so
                # jnp/kernel gradients agree lane-for-lane.
                steal = (
                    pw_mask & cross_valid
                    & (jax.lax.stop_gradient(t_w - ph_t)
                       < 30.0 * jax.lax.stop_gradient(sigx))
                )
                blk_term = jnp.where(steal, 0.0, blk_term)
                qx_s = qx
                qx_p = qx
                if "sg_qf_sphere" in _SIL_DBG:
                    qx_s = jax.lax.stop_gradient(qx)
                if "sg_qf_plane" in _SIL_DBG:
                    qx_p = jax.lax.stop_gradient(qx)
                qf = jnp.where(pw_mask, 1.0 - qx_p, qx_s)
                qf = jnp.where(cross_valid & alive, qf, 1.0)
                if "sg_qf" in _SIL_DBG:
                    qf = jax.lax.stop_gradient(qf)
            # Floor ONLY the acceptance probability (we - m): as a DIFFERENCE
            # of sigmoids its score dp/p is heavy-tailed (blocker ~ winner),
            # and the floor's one-sided clip there is a bounded bias.  The
            # crossing factor qf must stay OUTSIDE the floor: a logistic's
            # score is bounded (d log q = (1-q) darg, d log(1-q) = -q darg),
            # and flooring it breaks the A/B pair cancellation — the realized
            # -plane tail (1-q < floor) zeroes while the realized-sphere side
            # keeps +dq L_A, leaving a net wrong-signed bias measured at ~35%
            # of the crossing term (experiments/r5_crossing_fd.py).
            p_out = we * ve - blk_term
            den = jnp.maximum(p_out, SIL_P_FLOOR)
            if ph_t is not None:
                den = den * qf
            tp = tp * (den / jax.lax.stop_gradient(den))[:, None]

        # Miss shader: sky gradient, terminal (SingleThreadPathTracer.hpp:11-19).
        miss = alive & ~hit.hit
        rad = rad + tp * sky_color(d, scene.sky_lo, scene.sky_hi) * miss[:, None]
        live = alive & hit.hit
        surviving = live & scattered
        tp = jnp.where(surviving[:, None], tp * att, tp)
        o = jnp.where(live[:, None], hit.point, o)
        d = jnp.where(surviving[:, None], new_d, d)
        if config.rr_start_depth:
            # Russian roulette: unbiased early termination by throughput.
            q = jnp.clip(jnp.max(tp, axis=-1), 0.05, 1.0)
            kill = (b >= jnp.uint32(config.rr_start_depth)) & (unif[:, 6] >= q)
            surviving = surviving & ~kill
            boost = (b >= jnp.uint32(config.rr_start_depth)) & surviving
            tp = jnp.where(boost[:, None], tp / q[:, None], tp)
        # Previous-winner carry (validity coin's hard-gate target): the
        # sphere the chain just bounced off; -1 on plane/miss lanes.
        prev = widx if widx is not None else jnp.full_like(prev, -1)
        return (o, d, tp, rad, surviving, prev), None

    n = origins.shape[0]
    tp0, rad0, alive0, prev0 = _vary_like(
        (jnp.ones((n, 3), jnp.float32), jnp.zeros((n, 3), jnp.float32),
         jnp.ones((n,), bool), jnp.full((n,), -1, jnp.int32)),
        (origins, dirs, keys),
    )
    init = (origins, dirs, tp0, rad0, alive0, prev0)
    # Remat policy: the full-jnp bounce materializes [rays, spheres]
    # intersection intermediates, so its backward must rematerialize per
    # bounce (jax.checkpoint) to stay memory-feasible (SURVEY.md S7 hard
    # part 4).  With use_pallas_hits the residuals are all [rays]-sized
    # (detached argmin + gather reconstruction), cheap enough to save —
    # skipping remat halves the backward's recompute.
    body = bounce if config.use_pallas_hits else jax.checkpoint(bounce)
    (o, d, tp, rad, alive, _prev), _ = jax.lax.scan(
        body, init, jnp.arange(config.max_depth, dtype=jnp.uint32)
    )
    # Rays still alive after the bounce budget return black (Shirley), like
    # the wavefront tracer's dropped 10th-pass rays (TaskBasedPathTracer.hpp:81).
    return rad


def render_pixels(
    scene: Scene,
    camera: Camera,
    config: RenderConfig,
    key,
    pixel_ids,
    sample_ids,
):
    """Radiance for explicit (pixel, sample) pairs — the sharding-friendly
    core unit: any slice of the global (pixel, sample) grid renders
    identically regardless of which device computes it."""
    keys = ray_keys(key, pixel_ids, sample_ids)
    if (
        config.use_pallas_grad
        and not config.use_pallas
        and scene.plane is None
        and not config.camera_grad
    ):
        # Fully-fused fast path incl. in-kernel camera ray generation — the
        # XLA-side threefry + ray math + packing was a measured ~35 ms
        # fixed cost per bench-scale dispatch.  Soft-silhouette configs run
        # here too since round 4 (the blend lives inside bounce_tile).
        # camera_grad configs skip it: the raygen kernel detaches the
        # camera, while generate_rays below is differentiable and the
        # fused trace returns ray cotangents.
        from .ops.pallas_grad import trace_pixels_fused

        return trace_pixels_fused(camera, keys, scene, config)
    jit4 = camera_jitter(keys)
    origins, dirs = generate_rays(camera, config.width, config.height, pixel_ids, jit4)
    return trace_rays(origins, dirs, keys, scene, config)


def _persistent_args(scene, camera, config, key):
    """Shared SMEM argument blocks for the persistent whole-render kernel."""
    from .ops.pallas_persistent import camera_constants

    tables = (
        scene.centers[:, 0], scene.centers[:, 1], scene.centers[:, 2],
        scene.radii, scene.radii * scene.radii,
        scene.albedo[:, 0], scene.albedo[:, 1], scene.albedo[:, 2],
        scene.material.astype(jnp.int32), scene.fuzz, scene.ior,
    )
    sky6 = jnp.concatenate([scene.sky_lo, scene.sky_hi]).astype(jnp.float32)
    cam19 = camera_constants(camera, config.width, config.height)
    kd = key if key.dtype == jnp.uint32 else jax.random.key_data(key)
    return tables, sky6, cam19, kd


def _render_block_pallas(
    scene, camera, config, key, pixel_ids, sample_offset, n_samples,
    return_counts=False,
):
    """Persistent-kernel radiance sum for a pixel block (forward fast path)."""
    from .ops.pallas_persistent import render_block_persistent

    tables, sky6, cam19, kd = _persistent_args(scene, camera, config, key)
    return render_block_persistent(
        pixel_ids, tables, sky6, cam19, kd, jnp.asarray(sample_offset, jnp.uint32),
        n_samples=n_samples, max_depth=config.max_depth,
        width=config.width, height=config.height,
        t_min=config.t_min, t_max=config.t_max,
        rr_start_depth=config.rr_start_depth,
        interpret=config.pallas_interpret,
        return_counts=return_counts, plane7=scene.plane,
    )


def _balanced_perm(counts):
    """Cost-balancing pixel permutation for the persistent kernel's lanes.

    ``counts[q]``: measured kernel iterations for the pixel at position q
    (from a probe pass).  The kernel assigns position q to bank q//n_lanes,
    lane q%n_lanes, and a 1024-lane block runs as long as its most loaded
    lane — with pixels in image order, lane loads inherit the image's
    spatial cost structure (glass pixels cost ~3x diffuse) and the
    straggler tail was measured at ~28% of total kernel time.

    Snake assignment over the cost ranking: bank k takes ranks
    [k*n_lanes, (k+1)*n_lanes), laid onto lanes in alternating direction,
    so every lane gets one pixel from each cost stratum and within-stratum
    slopes cancel.  Lane sums concentrate near the mean; the block max
    approaches it.  The reference's analog is its tile scheduler's implicit
    load imbalance (include/Renderer.hpp:257-302 — a thread per tile,
    expensive tiles straggle); this is the measured-cost fix it lacks.
    """
    from .ops.pallas_persistent import _BLOCK, DEFAULT_BANKS

    p = counts.shape[0]
    # Must mirror render_block_persistent's bank geometry exactly.
    n_banks = int(min(DEFAULT_BANKS, max(1, p // _BLOCK)))
    n_lanes = -(-p // n_banks)
    order = jnp.argsort(-counts).astype(jnp.int32)   # rank -> position
    q = jnp.arange(p, dtype=jnp.int32)
    k = q // n_lanes
    l = q % n_lanes
    # Snake only over full banks (a partial final bank keeps identity order
    # so rank(q) stays a bijection onto [0, p)).
    use_snake = ((k % 2) == 1) & ((k + 1) * n_lanes <= p)
    rank = k * n_lanes + jnp.where(use_snake, n_lanes - 1 - l, l)
    return order[rank]


def _coherent_pixel_order(pixel_ids, config):
    """Reorder a row-aligned pixel block into spatial-tile order.

    The fused Pallas gradient kernels skip fully-dead (8, 128) ray blocks
    (``lax.cond`` on any-alive); in row-major order each 1024-ray block
    spans almost a full image row, so nearly every block keeps one live
    lane at every bounce and the per-bounce sphere scan runs at no-skip
    cost (measured 95.8 ms forward at 1200x800 depth 10 — ~10 effective
    full scans for a ~2.7-bounce mean path).  Tile order groups each block
    into a ~32x32 pixel square that dies as a unit (sky tiles after bounce
    0, diffuse ground after 2-3 bounces).

    Pure reshape/transposes — no gathers (XLA TPU gather on [N]-sized
    operands is ~30 M elem/s, which would eat the win).  Per-ray radiance
    is unchanged (all randomness is keyed by the carried pixel/sample
    ids), only its layout; ``unpermute`` restores pixel order.  Returns
    the identity when the block is not a whole number of image rows.
    """
    p = pixel_ids.shape[0]
    w = config.width
    identity = (pixel_ids, lambda rad: rad)
    if p % w:
        return identity
    rows = p // w
    tr = max(d for d in range(1, min(rows, 32) + 1) if rows % d == 0)
    tc = max(
        (d for d in range(1, w + 1) if w % d == 0 and d * tr <= 1024),
        default=0,
    )
    if tr * tc < 256:
        return identity
    pids = (
        pixel_ids.reshape(rows // tr, tr, w // tc, tc)
        .transpose(0, 2, 1, 3)
        .reshape(p)
    )

    def unpermute(rad):
        return (
            rad.reshape(rows // tr, w // tc, tr, tc, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(p, 3)
        )

    return pids, unpermute


def render_pixel_block(scene, camera, config, key, pixel_ids, sample_offset, n_samples):
    """Radiance sum over ``n_samples`` consecutive sample ids for an explicit
    block of pixels. Returns [len(pixel_ids), 3] radiance sum (not averaged).

    This is the unit each device computes under ``shard_map``: the reference's
    analog is one image tile rendered by one worker thread
    (include/Renderer.hpp:242-255) — but here *which* device renders a block
    cannot change the result, because all randomness is keyed by global
    (pixel, sample) ids.  Samples are folded in ``spp_chunk``-sized scan steps
    to bound live memory.
    """
    if config.use_pallas:
        # Persistent kernel: samples loop in-kernel (in-lane regeneration),
        # so no spp chunking is needed — VMEM state is per-pixel, not
        # per-(pixel, sample).
        return _render_block_pallas(
            scene, camera, config, key, pixel_ids, sample_offset, n_samples
        )

    # Regen kernels cover every scene since round 4: sphere-only, ground
    # plane (virtual-unit-sphere winner, PLANE_IDX code), and soft
    # silhouettes (in-bounce blend).  camera_grad excludes them (they
    # consume pixel ids directly; the camera never enters as rays).
    use_regen = (
        config.use_pallas_grad and config.grad_regen
        and not config.camera_grad
    )
    unperm = lambda rad: rad  # noqa: E731
    if config.use_pallas_grad and not use_regen:
        pixel_ids, unperm = _coherent_pixel_order(pixel_ids, config)

    p = pixel_ids.shape[0]
    chunk = config.spp_chunk or n_samples
    chunk = min(chunk, n_samples)
    if n_samples % chunk:
        # spp_chunk is an upper bound, not a contract: a sharded call sees
        # n_samples = spp / mesh_samples, which the configured chunk need
        # not divide.  Use the largest divisor that fits.
        chunk = next(c for c in range(chunk, 0, -1) if n_samples % c == 0)
    n_steps = n_samples // chunk

    idx_packable = False
    if use_regen and n_steps > 1 and config.grad_regen_stream:
        from .ops.pallas_grad_regen import IDX_PACK_MAX_SPHERES, _IDX_PACK

        idx_packable = scene.num_spheres <= IDX_PACK_MAX_SPHERES
        stream_fits = (
            # idx-plane capacity: 4 B per _IDX_PACK lane-iterations over ALL
            # samples (the winner-index record phase A keeps for phase B's
            # scan-free re-forwards).  Past this, fall back to chunked remat
            # below — measured the right call: any beyond-capacity schedule
            # must forward every sample twice (loss pass + idx-record pass),
            # and remat's re-forward (13.6 M sustained) beats both the
            # checkpointed stream (2x phase A + B ~ 12.8 M) and a pure-fwd +
            # per-group stream (~12.6 M) at bench scale (BASELINE.md r4).
            # Soft configs stream a second packed plane (blocker indices).
            (2 if config.silhouette_softness > 0.0 else 1)
            * 4 * p * n_samples * config.max_depth
            <= _IDX_PACK * _IDX_PLANE_BUDGET
            # 10-bit packed idx+1 must hold every padded sphere slot.
            and scene.num_spheres <= IDX_PACK_MAX_SPHERES
        )
    else:
        stream_fits = False
    if stream_fits:
        # Streamed-idx gradient path: one idx-only forward over all
        # samples, then per-chunk scan-free re-forward + backward — the
        # remat re-forward's sphere scans (~85% of its cost) are gone.
        # Radiance is bit-identical to the chunked path (same forward
        # kernel code, same accumulation order).
        from .ops.pallas_grad_regen import render_block_grad_regen_stream

        return render_block_grad_regen_stream(
            scene, camera, config, key, pixel_ids, sample_offset,
            n_samples, chunk, n_banks=config.grad_regen_banks or None,
        )
    if idx_packable:
        # Beyond streamed-idx capacity: the DETERMINISTIC checkpointed
        # stream (round 5) — idx planes re-recorded per chunk in the
        # backward by the same Mosaic binary as the value pass, so replay
        # winners cannot flip (the old jax.checkpoint remat's re-forward
        # was a different XLA program and could — CLAUDE.md round 4).
        # ~6% slower than remat at bench scale; only >capacity fits pay.
        from .ops.pallas_grad_regen import render_block_grad_regen_stream

        return render_block_grad_regen_stream(
            scene, camera, config, key, pixel_ids, sample_offset,
            n_samples, chunk, n_banks=config.grad_regen_banks or None,
            checkpoint_idx=True,
        )

    def step(acc, i):
        off = sample_offset + i * chunk
        if use_regen:
            # Regeneration kernels consume (pixel block, sample range)
            # directly and return per-pixel sums — no [chunk * p] ray
            # batch is ever materialized.
            from .ops.pallas_grad_regen import render_block_grad_regen

            batch = render_block_grad_regen(
                scene, camera, config, key, pixel_ids, off, chunk,
                n_banks=config.grad_regen_banks or None,
            )
            return acc + batch, None
        pids = jnp.tile(pixel_ids, (chunk,))
        sids = jnp.repeat(off + jnp.arange(chunk, dtype=jnp.int32), p)
        rad = render_pixels(scene, camera, config, key, pids, sids)
        return acc + jnp.sum(rad.reshape(chunk, p, 3), axis=0), None

    if n_steps > 1:
        # Rematerialize each chunk under autodiff: otherwise the scan saves
        # every chunk's residuals (the fused Pallas path keeps 21 f32 tiles
        # per ray per bounce — ~840 MB per bench-scale spp) and chunking
        # would bound nothing.  Forward-only jit is unaffected.
        step = jax.checkpoint(step)

    acc0 = _vary_like(jnp.zeros((p, 3), jnp.float32), (pixel_ids, sample_offset, key))
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(n_steps))
    return unperm(acc)


def render_sample_batch(scene, camera, config, key, sample_offset, n_samples,
                        pixel_ids=None):
    """Sum of radiance over ``n_samples`` consecutive sample ids for every
    pixel. Returns [P, 3] radiance sum (not yet averaged).

    Delegates to render_pixel_block over the full pixel range, so
    ``spp_chunk`` bounds live (and, under autodiff, rematerialized
    residual) memory here too — pixel_loss/fit at preset spp would
    otherwise trace one monolithic [spp * P]-ray program.

    ``pixel_ids`` (optional): render pixels in this order instead of
    row-major — row i of the result is pixel pixel_ids[i].  Randomness is
    keyed by global pixel id, so a permutation changes LANE PLACEMENT
    only, never values; a cost-balanced order (balanced_pixel_perm) evens
    per-lane work for the banked kernels.
    """
    if pixel_ids is None:
        pixel_ids = jnp.arange(config.num_pixels, dtype=jnp.int32)
    return render_pixel_block(
        scene, camera, config, key, pixel_ids, sample_offset, n_samples
    )


def balanced_pixel_perm(scene, camera, config, key, probe_spp=2):
    """Cost-balanced pixel order from a persistent-kernel probe.

    Renders ``probe_spp`` real spp with iteration counting and returns the
    snake-balanced permutation (_balanced_perm) that the banked kernels'
    position->(bank, lane) map (pallas_common.banked_lane_layout) turns
    into near-equal per-lane work.  The probe requires the forward Pallas
    kernel (TPU or interpret mode).  Intended for gradient-path consumers
    (inverse.fit(balance=True)): the forward accumulate() path probes
    internally via config.balance_probe_spp instead.
    """
    pixel_ids = jnp.arange(config.num_pixels, dtype=jnp.int32)
    pcfg = config.replace(
        use_pallas=True, use_pallas_grad=False, use_pallas_hits=False,
        # The probe itself must run somewhere: interpret on CPU backends
        # (e.g. `spt-render invert --balance` off-chip) instead of failing.
        pallas_interpret=(
            config.pallas_interpret or jax.default_backend() != "tpu"
        ),
    )
    _, counts = _render_block_pallas(
        scene, camera, pcfg, key, pixel_ids, 0, probe_spp, return_counts=True
    )
    return _balanced_perm(counts)


def init_state(config: RenderConfig, key) -> RenderState:
    return RenderState(
        accum=jnp.zeros((config.height, config.width, 3), jnp.float32),
        sample_count=jnp.zeros((), jnp.int32),
        next_key=key,
    )


@functools.partial(jax.jit, static_argnames=("config", "n_samples"))
def accumulate(
    state: RenderState, scene: Scene, camera: Camera, config: RenderConfig, n_samples: int
) -> RenderState:
    """Progressive accumulation: fold ``n_samples`` more spp into the state.

    Deterministic resume: sample ids continue from ``state.sample_count``, so
    stop/checkpoint/restart yields the bit-identical image as an
    uninterrupted run (the reference loses everything on a crash —
    SURVEY.md S5 checkpoint row).
    """
    probe = config.balance_probe_spp if config.use_pallas else 0
    if probe and n_samples > probe:
        return _accumulate_balanced(state, scene, camera, config, n_samples, probe)

    chunk = config.spp_chunk or n_samples
    chunk = min(chunk, n_samples)
    if n_samples % chunk:
        # Same largest-divisor fallback as render_pixel_block: spp_chunk is
        # an upper bound, not a contract (e.g. the CLI's auto-picked live
        # preview chunk need not be a multiple of it).
        chunk = next(c for c in range(chunk, 0, -1) if n_samples % c == 0)
    n_steps = n_samples // chunk

    def step(accum, i):
        off = state.sample_count + i * chunk
        batch = render_sample_batch(scene, camera, config, state.next_key, off, chunk)
        return accum + batch.reshape(config.height, config.width, 3), None

    accum, _ = jax.lax.scan(step, state.accum, jnp.arange(n_steps))
    return RenderState(
        accum=accum,
        sample_count=state.sample_count + n_samples,
        next_key=state.next_key,
    )


def _accumulate_balanced(state, scene, camera, config, n_samples, probe):
    """Probe-then-balance accumulation (persistent kernel).

    The probe chunk renders ``probe`` real spp in image order and measures
    per-pixel kernel iterations; the remaining spp render with pixels
    assigned to lanes in cost-balanced snake order (``_balanced_perm``).
    Pixel values are bit-identical to the unbalanced two-chunk schedule —
    randomness is keyed by global (pixel, sample) ids, so lane placement
    cannot change any sample — only the lane schedule (and therefore the
    block-straggler waste) changes.
    """
    h, w = config.height, config.width
    p = config.num_pixels
    pixel_ids = jnp.arange(p, dtype=jnp.int32)
    batch, counts = _render_block_pallas(
        scene, camera, config, state.next_key, pixel_ids,
        state.sample_count, probe, return_counts=True,
    )
    accum = state.accum + batch.reshape(h, w, 3)
    perm = _balanced_perm(counts)
    rad = _render_block_pallas(
        scene, camera, config, state.next_key, perm,
        state.sample_count + probe, n_samples - probe,
    )
    inv = jnp.argsort(perm)
    accum = accum + rad[inv].reshape(h, w, 3)
    return RenderState(
        accum=accum,
        sample_count=state.sample_count + n_samples,
        next_key=state.next_key,
    )


def render(scene: Scene, camera: Camera, config: RenderConfig, key) -> jax.Array:
    """One-shot render: [H, W, 3] gamma-corrected float image in [0, 1]."""
    state = init_state(config, key)
    state = accumulate(state, scene, camera, config, config.spp)
    return state.image(config.gamma)
