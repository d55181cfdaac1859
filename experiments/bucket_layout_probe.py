"""Feasibility probe for the row-embedded-idx bucket kernel redesign.

The [N, 1] i32 idx operand of pallas_bucket tile-pads (T(8,128)) to 128x
its logical size — at the regen path's N = b_total*rows*128 = 77.3M that
is a 39.6 GB allocation (the round-3 bench OOM).  The fix embeds idx as a
bitcast f32 ROW of the existing [K_pad, N] cotangent operand and builds
the one-hot TRANSPOSED ([SCH, rays] from a [1, rays] sublane broadcast),
contracting lanes-with-lanes on the MXU (A @ B^T).  This probe validates
the three Mosaic requirements on small shapes:
  (a) dot_general dimension_numbers (((1,), (1,)), ((), ()))
  (b) [1, rays] -> [SCH, rays] sublane broadcast vs iota
  (c) bitcast f32 row -> i32 in-kernel

Run: python experiments/bucket_layout_probe.py          (real TPU)
     PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python ... (interpret only)
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_PAD, RAYS, SCH = 16, 512, 128
IDX_ROW = 9


def kernel(ctt_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    ctt = ctt_ref[:]
    idx = pltpu.bitcast(ctt[IDX_ROW:IDX_ROW + 1, :], jnp.int32)  # [1, rays]

    @pl.when(jnp.any(idx >= 0))
    def _acc():
        row = jax.lax.broadcasted_iota(jnp.int32, (K_PAD, RAYS), 0)
        ct = jnp.where(row == IDX_ROW, 0.0, ctt)
        c1 = ct.astype(jnp.bfloat16)
        r1 = ct - c1.astype(jnp.float32)
        c2 = r1.astype(jnp.bfloat16)
        c3 = (r1 - c2.astype(jnp.float32)).astype(jnp.bfloat16)
        sub = jax.lax.broadcasted_iota(jnp.int32, (SCH, RAYS), 0)
        for c in range(2):
            oh_t = (jnp.broadcast_to(idx, (SCH, RAYS)) == sub + c * SCH
                    ).astype(jnp.bfloat16)

            def dot(a):
                return jax.lax.dot_general(
                    a, oh_t, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            part = dot(c1) + dot(c2) + dot(c3)
            out_ref[:, c * SCH:(c + 1) * SCH] = (
                out_ref[:, c * SCH:(c + 1) * SCH] + part
            )


def run(interpret):
    n, s = 2 * RAYS, 2 * SCH
    rng = np.random.default_rng(0)
    ct = rng.normal(size=(K_PAD, n)).astype(np.float32) * (1 + 1e-7)
    ct[IDX_ROW:] = 0.0
    idx = rng.integers(-1, s, size=n).astype(np.int32)
    ctt = jnp.asarray(ct).at[IDX_ROW].set(
        jax.lax.bitcast_convert_type(jnp.asarray(idx), jnp.float32)
    )
    out = pl.pallas_call(
        kernel,
        grid=(n // RAYS,),
        in_specs=[pl.BlockSpec((K_PAD, RAYS), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K_PAD, s), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K_PAD, s), jnp.float32),
        interpret=interpret,
    )(ctt)
    out = np.asarray(out)
    want = np.zeros((K_PAD, s), np.float32)
    for r in range(n):
        if idx[r] >= 0:
            want[:, idx[r]] += np.where(np.arange(K_PAD) == IDX_ROW, 0, ct[:, r])
    err = np.abs(out - want).max()
    print(f"interpret={interpret} max_abs_err={err:.3e}")
    # Interpret mode ON TPU hits the terminal-forced
    # --xla_allow_excess_precision=true, which elides the bf16x3 split
    # (r1 -> 0): only bf16-single-pass accuracy there.  Mosaic (compiled)
    # and CPU interpret are exact to f32.
    loose = interpret and jax.devices()[0].platform != "cpu"
    assert err < (3e-2 if loose else 1e-4), (out[:3, :5], want[:3, :5])


if __name__ == "__main__":
    run(True)
    if jax.devices()[0].platform != "cpu" or "--compiled" in sys.argv:
        run(False)
    print("PROBE OK")
