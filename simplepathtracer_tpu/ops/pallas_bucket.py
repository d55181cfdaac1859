"""Pallas bucket-accumulate kernel: the scatter-add transpose of a
small-table gather, at memory speed-of-light.

d_table[s, k] = sum over rays r of (idx[r] == s) * ct[r, k]

The jnp fallback (table_gather.bucket_rows) materializes chunked [N, S]
one-hot matrices in HBM — ~2 GB of traffic per bounce at N=1e6, S=512,
measured ~7 ms/bounce (70 ms of a 193 ms fwd+bwd step).  This kernel
builds each one-hot TILE in registers and feeds the MXU directly, so HBM
traffic is just ct once (~40 MB/bounce):

  * ct arrives transposed [K_pad, N]: rays on lanes -> the dot's
    contraction dim needs no in-kernel relayout;
  * idx rides INSIDE the ct operand as a bitcast-f32 row (row ``k``).  An
    earlier revision passed idx as a separate [N, 1] i32 column, but TPU
    tiling (T(8,128)) pads the lane dim 1 -> 128: a 128x allocation  —
    3.9 GB/bounce on the per-bounce gradient path and a fatal 39.6 GB at
    the regeneration path's N = 77M (the round-3 compile OOM).  A bitcast
    row costs zero extra HBM: the [K_pad, N] operand already has spare
    zero rows.  Bit patterns survive (copies/reshapes never canonicalize),
    and the row is zeroed in-register before the dot.
  * the one-hot is built TRANSPOSED, [sphere_chunk, rays], by
    sublane-broadcasting the [1, rays] idx row against a sublane iota; the
    MXU contracts lanes-with-lanes (A @ B^T, dimension_numbers
    (((1,), (1,)), ((), ()))) — validated exact on Mosaic by
    experiments/bucket_layout_probe.py;
  * out[k, s] accumulates across grid steps in a single VMEM block
    (index_map pins every step to block (0, 0)).

Reference counterpart: none — the reference has no autodiff; this is the
transpose of Collision.hpp:87-109's winner lookup, the op that made the
round-1 backward 40x slower than forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_common import vma_union

_RAYS = 512     # rays per grid step (contraction depth per dot)
_SCH = 128      # sphere chunk (one-hot lane width)


def _bucket_kernel(ctt_ref, out_ref, *, n_sphere_chunks: int, idx_row: int,
                   rays: int = _RAYS):
    """ctt_ref: (K_pad, rays) f32 with bitcast-i32 winner indices in row
    ``idx_row``; out_ref: (K_pad, n_sphere_chunks * _SCH) f32 accumulator
    (row ``idx_row`` and above are zero-cotangent padding)."""

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    k_pad = ctt_ref.shape[0]
    ctt = ctt_ref[:]
    idx = pltpu.bitcast(ctt[idx_row:idx_row + 1, :], jnp.int32)  # [1, rays]
    # Dead-chunk skip: idx rows that can contribute a nonzero cotangent are
    # >= 0 (the gradient kernels mask dead/miss lanes to -1 and their ct is
    # exactly zero).  By the late bounces most chunks are fully dead.
    # (A per-chunk pl.when skip was tried here — 31 conditional MXU regions
    # pushed the Mosaic compile past 9 minutes for a few-ms win.  The
    # block-level any(idx >= 0) gate keeps compile at seconds.)
    @pl.when(jnp.any(idx >= 0))
    def _accumulate():
        # Zero the idx row (its bit pattern is not a cotangent) before the
        # bf16 split; the split then stays exact row-wise.
        row = jax.lax.broadcasted_iota(jnp.int32, (k_pad, rays), 0)
        ct = jnp.where(row == idx_row, 0.0, ctt)
        # Manual bf16x3 split of the cotangent (Mosaic dots only support
        # DEFAULT and HIGHEST): the one-hot side is EXACT in bf16 (0/1), so
        # three native bf16 passes recover all 24 mantissa bits of ct —
        # same result class as HIGHEST (x6 passes) at half the MXU passes.
        # f32 accumulation throughout (preferred_element_type).  Measured
        # 121.8 -> 119.4 ms on the fwd+bwd step: the kernel is mostly
        # bound by the VPU one-hot build + the M=16-row MXU shape, not by
        # pass count, so the win is real but modest.
        c1 = ct.astype(jnp.bfloat16)
        r1 = ct - c1.astype(jnp.float32)
        c2 = r1.astype(jnp.bfloat16)
        c3 = (r1 - c2.astype(jnp.float32)).astype(jnp.bfloat16)
        sub = jax.lax.broadcasted_iota(jnp.int32, (_SCH, rays), 0)
        idx_b = jnp.broadcast_to(idx, (_SCH, rays))
        for c in range(n_sphere_chunks):
            # [sphere_chunk, rays] transposed one-hot: contract lanes.
            onehot_t = (idx_b == sub + c * _SCH).astype(jnp.bfloat16)

            def dot(a):
                # [K_pad, rays] @ [_SCH, rays]^T -> [K_pad, _SCH] (MXU).
                return jax.lax.dot_general(
                    a, onehot_t,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            part = dot(c1) + dot(c2) + dot(c3)
            out_ref[:, c * _SCH:(c + 1) * _SCH] = (
                out_ref[:, c * _SCH:(c + 1) * _SCH] + part
            )


def _rays_per_step(n: int) -> int:
    """Largest supported contraction depth dividing n.

    Bigger steps mean fewer grid iterations, fewer out-block RMW round
    trips, and deeper (better-pipelined) MXU contractions; 512 is the
    floor every padded ray count divides.
    """
    for r in (4096, 2048, 1024):
        if n % r == 0:
            return r
    return _RAYS


def _bucket_call(ctt, idx_row, k, n, n_buckets, interpret, vma):
    """Shared pallas_call wrapper: ctt is [K_pad, n] f32 with the bitcast
    idx row at ``idx_row``; returns [n_buckets, k] f32."""
    k_pad = ctt.shape[0]
    s_pad = -(-n_buckets // _SCH) * _SCH
    rays = _rays_per_step(n)
    out = pl.pallas_call(
        functools.partial(
            _bucket_kernel, n_sphere_chunks=s_pad // _SCH, idx_row=idx_row,
            rays=rays,
        ),
        grid=(n // rays,),
        in_specs=[
            pl.BlockSpec((k_pad, rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k_pad, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, s_pad), jnp.float32, vma=vma),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * s_pad * k_pad,
            bytes_accessed=4 * (k_pad * n + k_pad * s_pad),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ctt)
    return out[:k, :n_buckets].T


def _idx_as_f32(idx):
    return jax.lax.bitcast_convert_type(idx.astype(jnp.int32), jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_buckets", "interpret"))
def bucket_rows_pallas(ct, idx, n_buckets: int, interpret: bool = False):
    """ct: [N, K] f32 cotangent rows; idx: [N] i32 -> [n_buckets, K] f32."""
    n, k = ct.shape
    k_pad = max(8, -(-(k + 1) // 8) * 8)   # +1: the bitcast idx row
    n_pad = -(-n // _RAYS) * _RAYS

    ctt = ct.T  # [K, N]
    if n_pad != n:
        # Padding rays: zero cotangent AND idx = -1, so an all-padding chunk
        # takes the dead-chunk skip instead of bucketing zeros into slot 0.
        ctt = jnp.concatenate(
            [ctt, jnp.zeros((k, n_pad - n), ct.dtype)], axis=1
        )
        idx = jnp.concatenate([idx, jnp.full((n_pad - n,), -1, idx.dtype)])
    ctt = jnp.concatenate([
        ctt,
        _idx_as_f32(idx).reshape(1, n_pad),
        jnp.zeros((k_pad - k - 1, n_pad), ct.dtype),
    ])
    vma = vma_union(ct, idx)
    return _bucket_call(ctt, k, k, n_pad, n_buckets, interpret, vma)


@functools.partial(jax.jit, static_argnames=("n_buckets", "interpret"))
def bucket_cols_pallas(cols, idx_tiles, n_buckets: int, interpret: bool = False):
    """bucket_rows_pallas on K separate (rows, 128) column tiles.

    ``cols``: K (rows, 128) f32 cotangent tiles (one per table attribute —
    the layout the gradient backward kernel emits); ``idx_tiles``:
    (rows, 128) i32 winner indices, -1 where the cotangent row is zero
    (dead/miss lanes).  Returns [n_buckets, K] f32.

    Avoids the [N, K] -> [K, N] XLA transpose of the row interface: the
    columns concatenate directly into the kernel's [K_pad, N] operand.
    """
    k = len(cols)
    rows = idx_tiles.shape[0]
    n = rows * idx_tiles.shape[1]
    k_pad = max(8, -(-(k + 1) // 8) * 8)   # +1: the bitcast idx row
    assert n % _RAYS == 0  # rows % 8 == 0 => n % 1024 == 0

    ctt = jnp.concatenate(
        [c.reshape(1, n) for c in cols]
        + [_idx_as_f32(idx_tiles).reshape(1, n)]
        + [jnp.zeros((k_pad - k - 1, n), cols[0].dtype)],
        axis=0,
    )
    vma = vma_union(*cols, idx_tiles)
    return _bucket_call(ctt, k, k, n, n_buckets, interpret, vma)
