"""Stage-1 cost probe: can an MXU matrix-form sphere scan beat the VPU scan?

The persistent kernel's closest-hit is a per-sphere VPU scan: ~35 (8,128)
tile-ops x S spheres per 1024-ray block, issue-bound at ~2.3 tile-ops/cycle
(CLAUDE.md perf model) => ~S*35/2.3 cycles/block.  A matrix formulation
replaces the per-pair dot products with two MXU contractions

    tc_part[r, s] = d[r] . c[s]        ([1024, 8] @ [8, S])
    oc_part[r, s] = o[r] . c[s]

plus ~16 elementwise ops per (ray, sphere) pair on [1024, S] arrays.  On
paper that's ~2x fewer VPU ops — but the MXU cost of a K=8 matmul with a
[1024, S] OUTPUT is the unknown that decides everything:

  * if the MXU achieves MAC throughput (16384 MACs/cycle), each dot is
    1024*S*8/16384 ≈ 256 cycles at S=512 — matrix form wins ~2x;
  * if it is bound by streaming the output (1 lhs row/cycle per 128-wide
    output column tile), each dot is (1024/128)*(S/128)*128 = 4096 cycles
    — two dots alone match the whole VPU scan and the idea is dead.

This probe times, inside single kernels with carry dependence (hoist-proof):
  1. scan512   — the real closest_hit_scan (the baseline cost anchor);
  2. dot_k8    — one [1024,8]@[8,512] f32 dot_general per iteration;
  3. dot2_k8   — the two dots the matrix form actually needs;
  4. mat_elem  — the ~16-op elementwise winner update over [1024,512]
                 (the VPU half of the matrix form, without the dots).

Timing discipline (CLAUDE.md): two T values per program, cost = delta/(T2-T1)
so tunnel dispatch constants cancel; sync on a tiny slice.

Findings (v5e, 2026-08-19, this file's __main__ run):
    scan512    3.43 us/iter   INVALID as a baseline: only w[0] (t) is
               consumed here, so Mosaic DCE'd the 12 winner-attribute
               selects and their loads (real kernels measure ~8 us/scan —
               bench vpu_utilization 0.92 against the 35-op model).
               Stage 2 (mxu_scan_probe2.py) re-measures with every output
               consumed.
    dot_k8     0.59 us/dot    ~550 cycles for [1024,8]@[8,512] f32: the
               MXU is near MAC-THROUGHPUT (0.27 us model), NOT bound by
               streaming the [1024,512] output (4.36 us model).  This is
               the green light for the matrix form.
    dot2_k8    2.51 us        two dots schedule worse than 2x one dot but
               remain far below the scan.
    mat_elem  -2.66 us        negative T-delta => the measurement is
               invalid (the 2 MB carried bt plane distorts the loop);
               stage 2 times the real elementwise phase in situ.
  => verdict: promising, decided by stage 2 (a complete matrix-form
     closest hit incl. ray relayout, exact argmin reduces, and the
     one-hot MXU attribute gather, against a DCE-proof scan baseline).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import simplepathtracer_tpu as spt

INTERPRET = jax.devices()[0].platform == "cpu"  # CPU sanity runs
from simplepathtracer_tpu.ops.pallas_common import (
    SUB, LANE, closest_hit_scan, pad_scene_tables,
)
from simplepathtracer_tpu.scenes import compact_scene

S = 512


def _tables():
    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=S))
    t = (  # (cx, cy, cz, radius, r2, ar, ag, ab, mat, fuzz, ior) — render.py:82
        scene.centers[:, 0], scene.centers[:, 1], scene.centers[:, 2],
        scene.radii, scene.radii * scene.radii,
        scene.albedo[:, 0], scene.albedo[:, 1], scene.albedo[:, 2],
        scene.material.astype(jnp.int32), scene.fuzz, scene.ior,
    )
    return pad_scene_tables(t), scene.num_spheres


def _rays(key):
    k1, k2 = jax.random.split(key)
    o = jax.random.normal(k1, (3, SUB, LANE), jnp.float32) * 3.0
    d = jax.random.normal(k2, (3, SUB, LANE), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    return o, d


# --- 1. the real scan, T iterations, carry-dependent --------------------------


def _scan_kernel(T, n_spheres, cx, cy, cz, rad, r2, ar, ag, ab, m, f, io,
                 ox, oy, oz, dx, dy, dz, out):
    tables = (cx, cy, cz, rad, r2, ar, ag, ab, m, f, io)
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])

    def body(i, acc):
        w = closest_hit_scan(
            tables, o[0] + acc * 1e-30, o[1], o[2], d[0], d[1], d[2],
            n_spheres=n_spheres, t_min=1e-3, t_max=1e8,
        )
        return acc + w[0]

    out[:] = jax.lax.fori_loop(0, T, body, jnp.zeros((SUB, LANE), jnp.float32))


def scan_program(T, n_spheres):
    tables, _ = _tables()
    o, d = _rays(jax.random.PRNGKey(7))
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(_scan_kernel, T, n_spheres),
        in_specs=[smem] * 11 + [vmem] * 6,
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        interpret=INTERPRET,
    )
    args = tuple(tables) + (o[0], o[1], o[2], d[0], d[1], d[2])
    return jax.jit(lambda: fn(*args))


# --- 2/3. K=8 dots with [1024, S] outputs -------------------------------------


def _dot_kernel(T, n_dots, lhs, rhs, out):
    def body(i, acc):
        l = lhs[:] * (1.0 + acc[0, 0] * 1e-30)
        p = jax.lax.dot_general(
            l, rhs[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + p[:SUB, :LANE]
        if n_dots == 2:
            p2 = jax.lax.dot_general(
                l + 1.0, rhs[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + p2[:SUB, :LANE]
        return acc

    out[:] = jax.lax.fori_loop(0, T, body, jnp.zeros((SUB, LANE), jnp.float32))


def dot_program(T, n_dots):
    lhs = jax.random.normal(jax.random.PRNGKey(1), (SUB * LANE, 8), jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(2), (8, S), jnp.float32)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(_dot_kernel, T, n_dots),
        in_specs=[vmem, vmem],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        interpret=INTERPRET,
    )
    return jax.jit(lambda: fn(lhs, rhs))


# --- 4. the matrix-form elementwise winner update ------------------------------


def _elem_kernel(T, tc, oc, r2row, out):
    def body(i, carry):
        bt, acc = carry
        tcv = tc[:] * (1.0 + acc[0, 0] * 1e-30)
        ocv = oc[:]
        disc = r2row[:] - (ocv - tcv * tcv)          # 2 ops (+1 mul)
        sq = jnp.sqrt(disc)                           # 1
        t_near = tcv - sq                             # 1
        t = jnp.where(t_near > 1e-3, t_near, tcv + sq)  # 3
        ok = (t > 1e-3) & (t < bt)                    # 3
        bt = jnp.where(ok, t, bt)                     # 1
        idxf = jnp.where(ok, tcv, sq)                 # 1 (stand-in select)
        acc = acc + bt[:SUB, :LANE] + idxf[:SUB, :LANE]
        return bt, acc

    bt0 = jnp.full((SUB * LANE, S), 1e8, jnp.float32)
    _, acc = jax.lax.fori_loop(
        0, T, body, (bt0, jnp.zeros((SUB, LANE), jnp.float32))
    )
    out[:] = acc


def elem_program(T):
    key = jax.random.PRNGKey(3)
    tc = jax.random.normal(key, (SUB * LANE, S), jnp.float32)
    oc = jax.random.normal(key, (SUB * LANE, S), jnp.float32) + 2.0
    r2 = jnp.abs(jax.random.normal(key, (1, S), jnp.float32))
    r2row = jnp.broadcast_to(r2, (SUB * LANE, S))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        functools.partial(_elem_kernel, T),
        in_specs=[vmem, vmem, vmem],
        out_specs=vmem,
        out_shape=jax.ShapeDtypeStruct((SUB, LANE), jnp.float32),
        interpret=INTERPRET,
    )
    return jax.jit(lambda: fn(tc, oc, r2row))


def time_program(make, T1, T2):
    """us per iteration from the (T2, T1) delta of best-of-2 runs."""
    def best(prog):
        prog()  # compile + warm
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
    _, n_spheres = _tables()
    n_pad = -(-n_spheres // 16) * 16
    print(f"device={jax.devices()[0]} spheres={n_spheres} pad={n_pad}", flush=True)
    t_scan = time_program(lambda T: scan_program(T, n_pad), 2000, 4000)
    print(f"scan512   {t_scan:8.2f} us/iter "
          f"(model {n_pad * 35 / 2.3 / 0.94e3:.2f})", flush=True)
    t_dot = time_program(lambda T: dot_program(T, 1), 2000, 4000)
    print(f"dot_k8    {t_dot:8.2f} us/iter "
          f"(stream-bound model {4096 / 0.94e3:.2f}, MAC-bound {256 / 0.94e3:.2f})",
          flush=True)
    t_dot2 = time_program(lambda T: dot_program(T, 2), 2000, 4000)
    print(f"dot2_k8   {t_dot2:8.2f} us/iter", flush=True)
    t_elem = time_program(elem_program, 2000, 4000)
    print(f"mat_elem  {t_elem:8.2f} us/iter", flush=True)
    verdict = "ALIVE" if t_dot2 + t_elem < 0.85 * t_scan else "DEAD"
    print(f"matrix-form lower bound {t_dot2 + t_elem:.2f} us vs scan "
          f"{t_scan:.2f} us -> {verdict}", flush=True)


if __name__ == "__main__":
    main()
