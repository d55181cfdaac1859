"""Stage-2 probe: a COMPLETE matrix-form closest-hit vs the real scan.

Stage 1 (mxu_scan_probe.py) showed K=16-class MXU dots with [1024, S]
outputs run near MAC-bound (~0.6 us), not output-streaming-bound — so a
matrix formulation of closest-hit is plausible.  This probe builds the
whole thing and times it fairly against the production scan (ALL 12 scan
outputs consumed — stage 1's scan baseline was DCE'd down to ~betterhalf
cost because the winner-attribute selects were dead).

Matrix form, per 1024-ray block, spheres chunked by S_CHUNK:

  R [16, 1024]   in-kernel relayout of the ray tiles: rows dx dy dz ox oy
                 oz 1 d.o |o|^2 (the (8,128)->(1,1024) reshape cost is
                 part of what we're measuring)
  C2 [2S, 16]    host-built sphere matrix: rows 0..S-1 give
                 tc = c.d - d.o, rows S.. give A = 2 o.c - (|c|^2-r^2) - |o|^2
  P = C2 @ R     one MXU dot -> tc, A as [S, 1024]
  disc = tc^2+A; t = near-or-far root (same semantics as the scan);
  key = (bits(t) & ~1023) | sphere_iota   -- packed argmin: f32 bits of a
                 positive t are monotone, so an i32 min over spheres picks
                 the smallest t and (on ties within 10 ulps) the smallest
                 index, matching the scan's first-wins tie rule up to
                 knife-edge flips the equivalence tests already tolerate
  one-hot(idx) -> attrs = TA [16, S] @ oh [S, 1024]  (MXU gather)
  13 back-relayouts (1,1024)->(8,128) for the consumers.

Findings (v5e, 2026-08-19, __main__ run):
    equivalence: idx agree 1.0000, attr agree 1.0000, t relmax 3.8e-3
                 (one grazing hit; fp-reorder class, tests tolerate)
    scan512(all-consumed)     6.21 us/iter
    matrix512(all-consumed)   9.77 us/iter      -> 0.64x: DEAD.
  The MXU dots are cheap (stage 1), but the matrix form's [S,1024]
  elementwise root/winner phase (~13 ops x 496 sublane-tiles), the two
  exact argmin reduces, the one-hot build, and the (8,128)<->(1,1024)
  relayouts together cost ~1.6x the whole scan.  Note the honest scan
  baseline (6.21 us, every output consumed) also runs FASTER standalone
  than inside the persistent kernel (~8 us by the bench roofline): the
  real kernel's ~30 carried state registers constrain Mosaic's
  scheduling, so any replacement must beat 6.2 us standalone to have a
  chance in situ — the matrix form is not close.  With culling
  (experiments/cull_potential.py), algebraic op-shaving (CLAUDE.md), and
  now the matrix form all measured dead, the VPU scan at ~0.92 roofline
  utilization is the closest-hit endgame on v5e.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import simplepathtracer_tpu as spt
from simplepathtracer_tpu.ops.pallas_common import (
    SUB, LANE, closest_hit_scan, pad_scene_tables,
)
from simplepathtracer_tpu.scenes import compact_scene

INTERPRET = jax.devices()[0].platform == "cpu"
BLOCK = SUB * LANE
T_MIN = 1e-3
T_MAX = 1e8
KEY_MASK = ~np.int32(1023)


def _tables():
    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    t = (
        scene.centers[:, 0], scene.centers[:, 1], scene.centers[:, 2],
        scene.radii, scene.radii * scene.radii,
        scene.albedo[:, 0], scene.albedo[:, 1], scene.albedo[:, 2],
        scene.material.astype(jnp.int32), scene.fuzz, scene.ior,
    )
    return pad_scene_tables(t), scene.num_spheres


def _rays(key, spread=3.0):
    k1, k2 = jax.random.split(key)
    o = jax.random.normal(k1, (3, SUB, LANE), jnp.float32) * spread
    d = jax.random.normal(k2, (3, SUB, LANE), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    return o, d


def build_sphere_matrices(tables):
    """(C2 [2S,16], TA [16,S]) host-side from the padded tables."""
    cx, cy, cz, rad, _r2, ar, ag, ab, mat, fz, io = [jnp.asarray(t) for t in tables]
    s = cx.shape[0]
    z = jnp.zeros((s,), jnp.float32)
    one = jnp.ones((s,), jnp.float32)
    k_s = cx * cx + cy * cy + cz * cz - rad * rad   # NaN on padding (rad=NaN)
    c_tc = jnp.stack(
        [cx, cy, cz, z, z, z, z, -one, z] + [z] * 7, axis=1)           # [S,16]
    c_a = jnp.stack(
        [z, z, z, 2 * cx, 2 * cy, 2 * cz, -k_s, z, -one] + [z] * 7, axis=1)
    c2 = jnp.concatenate([c_tc, c_a], axis=0)                           # [2S,16]
    # NaN-padded radius slots must be scrubbed in TA: the one-hot gather
    # contracts over every slot and 0 * NaN = NaN (padding rejection rides
    # on C2's k_s NaN instead, which only poisons its own sphere's row).
    ta = jnp.stack(
        [cx, cy, cz, jnp.nan_to_num(rad), ar, ag, ab,
         mat.astype(jnp.float32), fz, io] + [z] * 6, axis=0)            # [16,S]
    return c2, ta


# --- matrix-form closest hit (kernel-internal function) -----------------------


def matrix_closest_hit(c2_ref, ta_ref, ox, oy, oz, dx, dy, dz, *, s_pad):
    """Returns the same 12-tuple as closest_hit_scan, all (8,128) tiles."""
    i32 = jnp.int32
    # ---- relayout rays to R [16, 1024] ----
    d_o = dx * ox + dy * oy + dz * oz
    oo = ox * ox + oy * oy + oz * oz
    rows = [dx, dy, dz, ox, oy, oz, jnp.ones((SUB, LANE), jnp.float32), d_o, oo]
    r16 = jnp.concatenate(
        [r.reshape(1, BLOCK) for r in rows]
        + [jnp.zeros((7, BLOCK), jnp.float32)], axis=0)
    # ---- one MXU dot: [2S,16] @ [16,1024] ----
    p = jax.lax.dot_general(
        c2_ref[:], r16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,   # geometry: no bf16 passes
    )
    tc = p[:s_pad]
    a = p[s_pad:]
    # ---- per-pair roots + exact two-reduce argmin ----
    disc = tc * tc + a
    sq = jnp.sqrt(disc)                     # NaN rejects (padding & misses)
    t_near = tc - sq
    t = jnp.where(t_near > T_MIN, t_near, tc + sq)
    ok = (t > T_MIN) & (t < T_MAX)
    tmask = jnp.where(ok, t, T_MAX)
    sidx = jax.lax.broadcasted_iota(i32, (s_pad, BLOCK), 0)
    t_row = jnp.min(tmask, axis=0, keepdims=True)           # (1, 1024) exact
    idx_row = jnp.min(
        jnp.where(tmask == t_row, sidx, s_pad), axis=0, keepdims=True
    )                                                        # first-wins ties
    miss = t_row >= T_MAX
    idx_row = jnp.where(miss, -1, idx_row)
    # ---- one-hot MXU attribute gather ----
    oh = jnp.where(sidx == idx_row, 1.0, 0.0)               # [S, 1024]
    attrs = jax.lax.dot_general(
        ta_ref[:], oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,   # one-hot pick must be exact
    )                                                        # [16, 1024]
    out = []
    for j in range(10):
        v = attrs[j:j + 1]
        if j == 3:      # radius: scan's miss default is 1.0
            v = jnp.where(miss, 1.0, v)
        if j == 9:      # ior: miss default 1.0
            v = jnp.where(miss, 1.0, v)
        out.append(v.reshape(SUB, LANE))
    (wcx, wcy, wcz, wr, war, wag, wab, wmatf, wfz, wio) = out
    bt = t_row.reshape(SUB, LANE)
    bi = idx_row.reshape(SUB, LANE)
    return (bt, bi, wcx, wcy, wcz, wr, war, wag, wab,
            wmatf.astype(i32), wfz, wio)


# --- probe kernels -------------------------------------------------------------


def _consume(w):
    """Sum every output so nothing is DCE'd (weights break symmetry)."""
    acc = w[0] * 1.0
    for j, v in enumerate(w[1:], start=1):
        acc = acc + (v.astype(jnp.float32) if v.dtype != jnp.float32 else v) * (
            np.float32(0.1 * j))
    return acc


def _scan_kernel(T, n_spheres, cx, cy, cz, rad, r2, ar, ag, ab, m, f, io,
                 ox, oy, oz, dx, dy, dz, out):
    tables = (cx, cy, cz, rad, r2, ar, ag, ab, m, f, io)

    def body(i, acc):
        w = closest_hit_scan(
            tables, ox[:] + acc * 1e-30, oy[:], oz[:], dx[:], dy[:], dz[:],
            n_spheres=n_spheres, t_min=T_MIN, t_max=T_MAX,
        )
        return acc + _consume(w)

    out[:] = jax.lax.fori_loop(0, T, body, jnp.zeros((SUB, LANE), jnp.float32))


def _matrix_kernel(T, s_pad, c2_ref, ta_ref, ox, oy, oz, dx, dy, dz, out):
    def body(i, acc):
        w = matrix_closest_hit(
            c2_ref, ta_ref, ox[:] + acc * 1e-30, oy[:], oz[:],
            dx[:], dy[:], dz[:], s_pad=s_pad,
        )
        return acc + _consume(w)

    out[:] = jax.lax.fori_loop(0, T, body, jnp.zeros((SUB, LANE), jnp.float32))


def scan_program(T):
    tables, _ = _tables()
    s_pad = tables[0].shape[0]
    o, d = _rays(jax.random.PRNGKey(7))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(_scan_kernel, T, s_pad),
        in_specs=[smem] * 11 + [vmem] * 6,
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        interpret=INTERPRET,
    )
    args = tuple(tables) + (o[0], o[1], o[2], d[0], d[1], d[2])
    return jax.jit(lambda: fn(*args))


def matrix_program(T):
    tables, _ = _tables()
    s_pad = tables[0].shape[0]
    c2, ta = build_sphere_matrices(tables)
    o, d = _rays(jax.random.PRNGKey(7))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(_matrix_kernel, T, s_pad),
        in_specs=[vmem] * 8,
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        interpret=INTERPRET,
    )
    return jax.jit(lambda: fn(c2, ta, o[0], o[1], o[2], d[0], d[1], d[2]))


# --- winner equivalence (single pass, both kernels, interpret-friendly) --------


def _eq_kernel(n_spheres, cx, cy, cz, rad, r2, ar, ag, ab, m, f, io,
               c2_ref, ta_ref, ox, oy, oz, dx, dy, dz, *outs):
    tables = (cx, cy, cz, rad, r2, ar, ag, ab, m, f, io)
    ws = closest_hit_scan(
        tables, ox[:], oy[:], oz[:], dx[:], dy[:], dz[:],
        n_spheres=n_spheres, t_min=T_MIN, t_max=T_MAX,
    )
    wm = matrix_closest_hit(
        c2_ref, ta_ref, ox[:], oy[:], oz[:], dx[:], dy[:], dz[:],
        s_pad=n_spheres,
    )
    outs[0][:] = ws[0]
    outs[1][:] = ws[1].astype(jnp.float32)
    outs[2][:] = wm[0]
    outs[3][:] = wm[1].astype(jnp.float32)
    outs[4][:] = ws[6]   # scan winner albedo.r
    outs[5][:] = wm[6]   # matrix winner albedo.r


def eq_program():
    tables, _ = _tables()
    s_pad = tables[0].shape[0]
    c2, ta = build_sphere_matrices(tables)
    o, d = _rays(jax.random.PRNGKey(11), spread=6.0)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    sds = jax.ShapeDtypeStruct((SUB, LANE), jnp.float32)
    fn = pl.pallas_call(
        functools.partial(_eq_kernel, s_pad),
        in_specs=[smem] * 11 + [vmem] * 8,
        out_specs=(vmem,) * 6,
        out_shape=(sds,) * 6,
        interpret=INTERPRET,
    )
    args = tuple(tables) + (c2, ta, o[0], o[1], o[2], d[0], d[1], d[2])
    return jax.jit(lambda: fn(*args))


def time_program(make, T1, T2):
    def best(prog):
        prog()
        dt = float("inf")
        for _ in range(2):
            t0 = time.time()
            np.asarray(prog()[:1, :1])
            dt = min(dt, time.time() - t0)
        return dt

    d1 = best(make(T1))
    d2 = best(make(T2))
    return (d2 - d1) / (T2 - T1) * 1e6


def main():
    ts, is_, tm, im, ars, arm = (np.asarray(x) for x in eq_program()())
    hit_s = is_ >= 0
    agree = (is_ == im)
    print(f"equivalence: hit-rate scan {hit_s.mean():.3f}  idx agree "
          f"{agree.mean():.4f}  t relmax "
          f"{np.nanmax(np.abs(ts - tm) / np.maximum(ts, 1e-6)):.2e}  "
          f"attr agree {(np.abs(ars - arm) < 1e-6).mean():.4f}", flush=True)
    t_scan = time_program(scan_program, 1500, 3000)
    print(f"scan512(all-consumed)   {t_scan:8.2f} us/iter", flush=True)
    t_mat = time_program(matrix_program, 1500, 3000)
    print(f"matrix512(all-consumed) {t_mat:8.2f} us/iter", flush=True)
    print(f"speedup {t_scan / t_mat:.2f}x", flush=True)


if __name__ == "__main__":
    main()
