"""Fused closest-hit Pallas TPU kernel — the hot loop at speed of light.

Reference counterpart: ``cd::FindClosestIntersectionSphere``
(include/Collision.hpp:87-109), the innermost loop of the whole tracer
(~2e9 calls per default frame, SURVEY.md S3.4).

Why a kernel: the jnp path materializes [rays, spheres] f32 intermediates in
HBM (2 matmul outputs + the argmin input per bounce ~ 6 GB/bounce at
960k rays x 512 spheres), making the render HBM-bound at ~1 Mpath/s.  This
kernel keeps the entire per-(ray, sphere) computation in registers/VMEM:

  * rays live on (8, 128) f32 VPU tiles (SoA: 6 component arrays),
  * sphere centers/radii^2 are scalars in SMEM, walked by a `fori_loop`
    (uniform control flow — every ray tests every sphere, the TPU analog of
    the reference's linear scan),
  * the running (best_t, best_index) pair stays in registers; only the
    final int32 winner index (and its t) is written back — HBM traffic is
    ~8 bytes/ray/bounce instead of ~8 KB,
  * blocks whose rays are all dead (absorbed/escaped) skip the sphere loop
    entirely — the TPU form of the wavefront tracer's shrinking queues
    (include/TaskBasedPathTracer.hpp:81-193) without compaction.

Differentiability: the kernel returns only the *discrete* argmin index.
The hit parameter t is recomputed outside in ~20 differentiable jnp ops on
the selected sphere (gather by index), so gradients w.r.t. centers/radii
flow through the standard JAX machinery and the kernel itself needs no VJP
(the argmin selection is correctly treated as locally constant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import closest_hit_scan, pad_scene_tables, vma_union

# Block geometry: 8 sublanes x 128 lanes = 1024 rays per grid step (f32 tile).
_SUB = 8
_LANE = 128
_BLOCK = _SUB * _LANE


def _closest_hit_kernel(
    cx_ref, cy_ref, cz_ref, r2_ref,  # SMEM [S] scene scalars
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, alive_ref,  # VMEM (8,128)
    idx_ref, t_ref,  # VMEM (8,128) outputs
    *, n_spheres: int, t_min: float, t_max: float,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    t0 = jnp.full((_SUB, _LANE), t_max, jnp.float32)
    i0 = jnp.full((_SUB, _LANE), -1, jnp.int32)

    def sphere_body(s, carry):
        best_t, best_i = carry
        cx, cy, cz, r2 = cx_ref[s], cy_ref[s], cz_ref[s], r2_ref[s]
        ocx = cx - ox
        ocy = cy - oy
        ocz = cz - oz
        tc = ocx * dx + ocy * dy + ocz * dz
        oc2 = ocx * ocx + ocy * ocy + ocz * ocz
        disc = r2 - (oc2 - tc * tc)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = tc - sq
        t = jnp.where(t_near > t_min, t_near, tc + sq)
        ok = (disc > 0.0) & (t > t_min) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_i = jnp.where(ok, s, best_i)
        return best_t, best_i

    def scan_spheres():
        return jax.lax.fori_loop(0, n_spheres, sphere_body, (t0, i0))

    # Whole-block dead-ray skip: by the late bounces most blocks are fully
    # terminated (rays are pixel-coherent), so the 512-sphere loop vanishes.
    any_alive = jnp.any(alive_ref[:] > 0)
    best_t, best_i = jax.lax.cond(any_alive, scan_spheres, lambda: (t0, i0))

    idx_ref[:] = best_i
    t_ref[:] = best_t


@functools.partial(
    jax.jit, static_argnames=("t_min", "t_max", "interpret")
)
def closest_hit_pallas(
    origins, dirs, alive, centers, radii, t_min=1e-3, t_max=3.0e7,
    interpret=False,
):
    """Closest-hit sphere index for a batch of rays.

    Args:
      origins, dirs: [N, 3] f32.
      alive: [N] bool — rays that still need intersection.
      centers: [S, 3] f32; radii: [S] f32 (sign only affects normals, not
        hits — the kernel uses radius^2).

    Returns (idx [N] int32 with -1 for miss, t [N] f32 with t_max for miss).
    N is padded internally to a multiple of 1024.
    """
    n = origins.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    pad = n_pad - n

    def comp(a, i):
        col = a[:, i]
        if pad:
            col = jnp.concatenate([col, jnp.zeros((pad,), a.dtype)])
        return col.reshape(n_pad // _LANE, _LANE)

    ox, oy, oz = comp(origins, 0), comp(origins, 1), comp(origins, 2)
    dx, dy, dz = comp(dirs, 0), comp(dirs, 1), comp(dirs, 2)
    al = alive.astype(jnp.float32)
    if pad:
        al = jnp.concatenate([al, jnp.zeros((pad,), jnp.float32)])
    al = al.reshape(n_pad // _LANE, _LANE)

    s = centers.shape[0]
    kernel = functools.partial(
        _closest_hit_kernel,
        n_spheres=s, t_min=float(t_min), t_max=float(t_max),
    )
    grid = (n_pad // _BLOCK,)
    ray_spec = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    # Under shard_map with check_vma the outputs must declare their varying
    # mesh axes: inherit the union from the inputs (same pattern as the
    # bounce/persistent kernels).
    vma = vma_union(origins, dirs, alive, centers, radii)

    idx2d, t2d = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem_spec] * 4 + [ray_spec] * 7,
        out_specs=(
            pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad // _LANE, _LANE), jnp.int32, vma=vma),
            jax.ShapeDtypeStruct((n_pad // _LANE, _LANE), jnp.float32, vma=vma),
        ),
        cost_estimate=pl.CostEstimate(
            flops=22 * n_pad * s, bytes_accessed=(7 + 2) * 4 * n_pad + 4 * 4 * s,
            transcendentals=n_pad * s,
        ),
        interpret=interpret,
    )(
        centers[:, 0], centers[:, 1], centers[:, 2], radii * radii,
        ox, oy, oz, dx, dy, dz, al,
    )
    return idx2d.reshape(-1)[:n], t2d.reshape(-1)[:n]


def _closest_hit_attrs_kernel(
    # SMEM scene tables (pallas_common.closest_hit_scan layout)
    cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
    albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    # VMEM ray state
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, alive_ref,
    # outputs: winner index + the 9 float attrs + material
    idx_ref, ocx, ocy, ocz, orad, oar, oag, oab, omat, ofz, oio,
    *, n_spheres: int, t_min: float, t_max: float,
):
    tables = (
        cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
        albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    )

    def scan():
        return closest_hit_scan(
            tables, ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:],
            n_spheres=n_spheres, t_min=t_min, t_max=t_max,
        )

    def skip():
        shape = (_SUB, _LANE)
        f32 = jnp.float32
        return (
            jnp.full(shape, t_max, f32), jnp.full(shape, -1, jnp.int32),
            jnp.zeros(shape, f32), jnp.zeros(shape, f32), jnp.zeros(shape, f32),
            jnp.ones(shape, f32), jnp.zeros(shape, f32), jnp.zeros(shape, f32),
            jnp.zeros(shape, f32), jnp.zeros(shape, jnp.int32),
            jnp.zeros(shape, f32), jnp.ones(shape, f32),
        )

    any_alive = jnp.any(alive_ref[:] > 0)
    (t, bi, cx, cy, cz, r, ar, ag, ab, mat, fz, io) = jax.lax.cond(
        any_alive, scan, skip
    )
    idx_ref[:] = bi
    ocx[:] = cx
    ocy[:] = cy
    ocz[:] = cz
    orad[:] = r
    oar[:] = ar
    oag[:] = ag
    oab[:] = ab
    omat[:] = mat
    ofz[:] = fz
    oio[:] = io


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "interpret"))
def closest_hit_attrs_pallas(
    origins, dirs, alive, scene_tables, t_min=1e-3, t_max=3.0e7, interpret=False
):
    """Closest hit + winner attributes in one fused kernel.

    The scan already tracks the winning sphere's attributes inline
    (pallas_common.closest_hit_scan); emitting them here removes EVERY
    [N]-sized jnp table gather from the gradient fast path — XLA's TPU
    gather runs at ~30 M elements/s, which made the glue 10x the physics
    (round-1 measured 56 ms/bounce jnp vs ~5 ms/bounce in-kernel).

    Args:
      origins, dirs: [N, 3] f32.  alive: [N] bool.
      scene_tables: the 11 [S] arrays (cx cy cz radius r2 albr albg albb
        mat fuzz ior) — same layout as the bounce/persistent kernels.

    Returns (idx [N] i32, attr9 tuple of 9 [N] f32 columns
    (cx cy cz r albr albg albb fuzz ior), mat [N] i32).  All outputs are
    detached values; reattach table gradients with
    table_gather.attach_attr_columns.
    """
    n = origins.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    pad = n_pad - n
    rows = n_pad // _LANE

    def comp(a, i):
        col = a[:, i]
        if pad:
            col = jnp.concatenate([col, jnp.zeros((pad,), a.dtype)])
        return col.reshape(rows, _LANE)

    ox, oy, oz = comp(origins, 0), comp(origins, 1), comp(origins, 2)
    dx, dy, dz = comp(dirs, 0), comp(dirs, 1), comp(dirs, 2)
    al = alive.astype(jnp.float32)
    if pad:
        al = jnp.concatenate([al, jnp.zeros((pad,), jnp.float32)])
    al = al.reshape(rows, _LANE)

    scene_tables = pad_scene_tables(scene_tables)
    s = scene_tables[0].shape[0]
    kernel = functools.partial(
        _closest_hit_attrs_kernel,
        n_spheres=s, t_min=float(t_min), t_max=float(t_max),
    )
    blk = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vma = vma_union(origins, dirs, alive, *scene_tables)
    f32out = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32, vma=vma)
    i32out = jax.ShapeDtypeStruct((rows, _LANE), jnp.int32, vma=vma)
    outs = pl.pallas_call(
        kernel,
        grid=(rows // _SUB,),
        in_specs=[smem] * 11 + [blk] * 7,
        out_specs=tuple([blk] * 11),
        out_shape=(i32out,) + (f32out,) * 7 + (i32out,) + (f32out,) * 2,
        cost_estimate=pl.CostEstimate(
            flops=30 * n_pad * s,
            bytes_accessed=(7 + 11) * 4 * n_pad + 11 * 4 * s,
            transcendentals=n_pad * s,
        ),
        interpret=interpret,
    )(*scene_tables, ox, oy, oz, dx, dy, dz, al)

    def unpack(a):
        return a.reshape(-1)[:n]

    idx = unpack(outs[0])
    attr9 = tuple(unpack(o) for o in outs[1:8]) + tuple(
        unpack(o) for o in outs[9:11]
    )
    mat = unpack(outs[8])
    return idx, attr9, mat
