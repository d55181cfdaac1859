"""The wavefront bounce megakernel: one Pallas call = one full bounce.

Reference counterpart: the entire per-bounce body of both reference tracers
— closest-hit scan (include/Collision.hpp:87-109), material dispatch + color
math (include/SingleThreadPathTracer.hpp:11-112), and the RNG draws
(include/Random.hpp:86-141) — fused into a single TPU kernel.

Design (why a megakernel): profiling the jnp bounce on a v5e chip showed
~16 ms/bounce in the intersection kernel and ~38 ms/bounce in the jnp
"glue" around it (attribute gathers from the sphere tables, hit
reconstruction, scatter math, carry updates) — the glue costs 2.4x the
physics.  Fusing the whole bounce keeps the ray state on (8, 128) VPU
tiles in VMEM for the entire step:

  * sphere scan: scalar ``fori_loop`` over SMEM tables; candidate-t uses
    IEEE NaN semantics (sqrt of a negative discriminant yields NaN, which
    fails every comparison) so no explicit validity mask is needed;
  * winner attributes (center, radius, material, albedo, fuzz, ior) are
    tracked inline with masked selects — no gathers anywhere;
  * RNG is the same counter-based threefry2x32 as ops/sampling.py,
    evaluated in-kernel on u32 tiles (identical streams to the jnp path:
    counter = (pixel, sample << 8 | slot));
  * sky + Lambertian/metal/dielectric scatter + throughput/radiance/alive
    updates run branchlessly on the tiles;
  * blocks whose 1024 rays are all dead skip everything.

HBM traffic per bounce is ~15 f32 per ray (the SoA ray state), vs several
KB in the unfused form.

NOT differentiable: this is the forward/rendering fast path.  Gradient
work (inverse rendering, sharded train steps) uses the jnp bounce in
render.py, which this kernel must match to fp tolerance —
tests/test_pallas_bounce.py asserts that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Material

_SUB = 8
_LANE = 128
_BLOCK = _SUB * _LANE

# threefry2x32 constants (must match ops/sampling.py).
_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)


def _rotl(x, r: int):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def _threefry2x32(k0, k1, c0, c1):
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


def _unit(bits):
    # Mosaic has no u32 -> f32 cast; the top-24-bit value fits in i32, so a
    # bitcast to i32 (exact, non-negative) then i32 -> f32 is equivalent.
    i = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    return i.astype(jnp.float32) * np.float32(2.0**-24)


def _bounce_kernel(
    # SMEM scene tables
    cx_ref, cy_ref, cz_ref, rad_ref, r2_ref,
    albr_ref, albg_ref, albb_ref, mat_ref, fuzz_ref, ior_ref,
    sky_ref,   # f32[6]: lo rgb, hi rgb
    meta_ref,  # u32[3]: k0, k1, bounce
    # VMEM ray state (8,128) blocks
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    tr_ref, tg_ref, tb_ref, rr_ref, rg_ref, rb_ref,
    alive_ref, pix_ref, samp_ref,
    # outputs
    n_ox, n_oy, n_oz, n_dx, n_dy, n_dz,
    n_tr, n_tg, n_tb, n_rr, n_rg, n_rb, n_alive,
    *, n_spheres: int, t_min: float, t_max: float,
):
    alive = alive_ref[:] > 0.0

    def do_bounce():
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

        # ---- closest-hit scan with inline winner-attribute tracking ----
        shape = (_SUB, _LANE)
        init = (
            jnp.full(shape, t_max, jnp.float32),          # best t
            jnp.full(shape, -1, jnp.int32),               # best index
            jnp.zeros(shape, jnp.float32),                # cx
            jnp.zeros(shape, jnp.float32),                # cy
            jnp.zeros(shape, jnp.float32),                # cz
            jnp.ones(shape, jnp.float32),                 # radius
            jnp.zeros(shape, jnp.float32),                # alb r
            jnp.zeros(shape, jnp.float32),                # alb g
            jnp.zeros(shape, jnp.float32),                # alb b
            jnp.zeros(shape, jnp.int32),                  # material
            jnp.zeros(shape, jnp.float32),                # fuzz
            jnp.ones(shape, jnp.float32),                 # ior
        )

        # Unroll so the scalar table loads and loop control overlap the VPU
        # work: measured 2.2x on v5e (12.4 vs 5.7 Mpaths/s on the cover
        # scene); unroll=8 is no faster and doubles compile time.
        unroll = next((u for u in (4, 2, 1) if n_spheres % u == 0), 1)

        def sphere_body(i, carry):
            for u in range(unroll):
                carry = one_sphere(i * unroll + u, carry)
            return carry

        def one_sphere(s, carry):
            (bt, bi, bcx, bcy, bcz, br, bar, bag, bab, bm, bf, bio) = carry
            scx, scy, scz, sr2 = cx_ref[s], cy_ref[s], cz_ref[s], r2_ref[s]
            ocx = scx - ox
            ocy = scy - oy
            ocz = scz - oz
            tc = ocx * dx + ocy * dy + ocz * dz
            oc2 = ocx * ocx + ocy * ocy + ocz * ocz
            disc = sr2 - (oc2 - tc * tc)
            # sqrt(disc) is NaN when disc < 0; NaN fails every comparison
            # below, so invalid candidates reject themselves for free.
            sq = jnp.sqrt(disc)
            t_near = tc - sq
            t = jnp.where(t_near > t_min, t_near, tc + sq)
            ok = (t > t_min) & (t < bt)
            bt = jnp.where(ok, t, bt)
            bi = jnp.where(ok, s, bi)
            bcx = jnp.where(ok, scx, bcx)
            bcy = jnp.where(ok, scy, bcy)
            bcz = jnp.where(ok, scz, bcz)
            br = jnp.where(ok, rad_ref[s], br)
            bar = jnp.where(ok, albr_ref[s], bar)
            bag = jnp.where(ok, albg_ref[s], bag)
            bab = jnp.where(ok, albb_ref[s], bab)
            bm = jnp.where(ok, mat_ref[s], bm)
            bf = jnp.where(ok, fuzz_ref[s], bf)
            bio = jnp.where(ok, ior_ref[s], bio)
            return (bt, bi, bcx, bcy, bcz, br, bar, bag, bab, bm, bf, bio)

        (t, bi, cx, cy, cz, r, ar, ag, ab, mat, fz, io) = jax.lax.fori_loop(
            0, n_spheres // unroll, sphere_body, init
        )
        hit = bi >= 0

        # ---- hit point + outward normal (sign of r flips for hollow) ----
        px = ox + t * dx
        py = oy + t * dy
        pz = oz + t * dz
        nx = (px - cx) / r
        ny = (py - cy) / r
        nz = (pz - cz) / r
        inv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-20)
        nx, ny, nz = nx * inv, ny * inv, nz * inv

        # ---- RNG: 4 threefry evals -> 7 uniforms (slot map of sampling.py)
        k0, k1, bounce = meta_ref[0], meta_ref[1], meta_ref[2]
        c0 = pix_ref[:]
        c1b = samp_ref[:] << jnp.uint32(8)
        slot0 = bounce * jnp.uint32(4)
        u = []
        for e in range(4):
            w0, w1 = _threefry2x32(k0, k1, c0, c1b | (slot0 + jnp.uint32(e)))
            u.append(_unit(w0))
            u.append(_unit(w1))
        # columns: 0-1 lambertian (z, phi); 2-4 fuzz ball; 5 coin; 6 spare

        # ---- sky miss shader ----
        tr, tg, tb = tr_ref[:], tg_ref[:], tb_ref[:]
        rr, rg, rb = rr_ref[:], rg_ref[:], rb_ref[:]
        s01 = 0.5 * (dy + 1.0)
        miss_f = jnp.where(alive & ~hit, 1.0, 0.0)
        skr = sky_ref[0] + (sky_ref[3] - sky_ref[0]) * s01
        skg = sky_ref[1] + (sky_ref[4] - sky_ref[1]) * s01
        skb = sky_ref[2] + (sky_ref[5] - sky_ref[2]) * s01
        rr = rr + tr * skr * miss_f
        rg = rg + tg * skg * miss_f
        rb = rb + tb * skb * miss_f

        # ---- face-forward normal ----
        d_dot_n = dx * nx + dy * ny + dz * nz
        front = d_dot_n < 0.0
        fsign = jnp.where(front, 1.0, -1.0)
        nfx, nfy, nfz = nx * fsign, ny * fsign, nz * fsign
        cos_t = jnp.minimum(-(dx * nfx + dy * nfy + dz * nfz), 1.0)

        # ---- Lambertian: nf + unit sphere point ----
        zl = 1.0 - 2.0 * u[0]
        rl = jnp.sqrt(jnp.maximum(1.0 - zl * zl, 0.0))
        phl = np.float32(2.0 * np.pi) * u[1]
        lx = nfx + rl * jnp.cos(phl)
        ly = nfy + rl * jnp.sin(phl)
        lz = nfz + zl
        ln2 = lx * lx + ly * ly + lz * lz
        linv = jax.lax.rsqrt(jnp.maximum(ln2, 1e-20))
        deg = ln2 <= 1e-12  # degenerate: fall back to the normal
        lamx = jnp.where(deg, nfx, lx * linv)
        lamy = jnp.where(deg, nfy, ly * linv)
        lamz = jnp.where(deg, nfz, lz * linv)

        # ---- Metal: mirror + fuzz * in-ball ----
        two_dn = 2.0 * (dx * nfx + dy * nfy + dz * nfz)
        rfx = dx - two_dn * nfx
        rfy = dy - two_dn * nfy
        rfz = dz - two_dn * nfz
        zm = 1.0 - 2.0 * u[2]
        rm = jnp.sqrt(jnp.maximum(1.0 - zm * zm, 0.0))
        phm = np.float32(2.0 * np.pi) * u[3]
        # cbrt has no Mosaic lowering; exp(log(u)/3) with a tiny floor is
        # equivalent to fp tolerance for u in [0, 1).
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

        # ---- Dielectric: Schlick + TIR ----
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

        # ---- material select + state update ----
        is_metal = mat == int(Material.METAL)
        is_diel = mat == int(Material.DIELECTRIC)
        ndx = jnp.where(is_metal, metx, lamx)
        ndy = jnp.where(is_metal, mety, lamy)
        ndz = jnp.where(is_metal, metz, lamz)
        ndx = jnp.where(is_diel, diex, ndx)
        ndy = jnp.where(is_diel, diey, ndy)
        ndz = jnp.where(is_diel, diez, ndz)
        atr = jnp.where(is_diel, 1.0, ar)
        atg = jnp.where(is_diel, 1.0, ag)
        atb = jnp.where(is_diel, 1.0, ab)
        scattered = metal_ok | ~is_metal

        live = alive & hit
        surv = live & scattered
        sf = jnp.where(surv, 1.0, 0.0)
        lf = jnp.where(live, 1.0, 0.0)
        n_tr[:] = tr * jnp.where(surv, atr, 1.0)
        n_tg[:] = tg * jnp.where(surv, atg, 1.0)
        n_tb[:] = tb * jnp.where(surv, atb, 1.0)
        n_ox[:] = ox + (px - ox) * lf
        n_oy[:] = oy + (py - oy) * lf
        n_oz[:] = oz + (pz - oz) * lf
        n_dx[:] = dx + (ndx - dx) * sf
        n_dy[:] = dy + (ndy - dy) * sf
        n_dz[:] = dz + (ndz - dz) * sf
        n_rr[:] = rr
        n_rg[:] = rg
        n_rb[:] = rb
        n_alive[:] = sf

    def skip():
        n_ox[:] = ox_ref[:]
        n_oy[:] = oy_ref[:]
        n_oz[:] = oz_ref[:]
        n_dx[:] = dx_ref[:]
        n_dy[:] = dy_ref[:]
        n_dz[:] = dz_ref[:]
        n_tr[:] = tr_ref[:]
        n_tg[:] = tg_ref[:]
        n_tb[:] = tb_ref[:]
        n_rr[:] = rr_ref[:]
        n_rg[:] = rg_ref[:]
        n_rb[:] = rb_ref[:]
        n_alive[:] = jnp.zeros((_SUB, _LANE), jnp.float32)

    jax.lax.cond(jnp.any(alive), do_bounce, skip)


@functools.partial(jax.jit, static_argnames=("t_min", "t_max", "interpret"))
def bounce_step_pallas(
    state, scene_tables, sky6, meta3, t_min=1e-3, t_max=3.0e7, interpret=False
):
    """One bounce on SoA ray state.

    Args:
      state: tuple of 15 [R, 128] arrays — ox oy oz dx dy dz tr tg tb rr rg
        rb (f32), alive (f32), pix (u32), samp (u32); R*128 rays, R % 8 == 0.
      scene_tables: tuple of 11 [S] arrays — cx cy cz radius r2 albr albg
        albb (f32), mat (i32), fuzz ior (f32).
      sky6: f32[6] (sky_lo rgb, sky_hi rgb).  meta3: u32[3] (k0, k1, bounce).

    Returns the 13 updated state arrays (ox..rb, alive).
    """
    rows = state[0].shape[0]
    grid = (rows // _SUB,)
    blk = pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    s = scene_tables[0].shape[0]
    kernel = functools.partial(
        _bounce_kernel, n_spheres=s, t_min=float(t_min), t_max=float(t_max)
    )
    out_sds = [jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)] * 13
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem] * 13 + [blk] * 15,
        out_specs=tuple([blk] * 13),
        out_shape=tuple(out_sds),
        cost_estimate=pl.CostEstimate(
            flops=30 * rows * _LANE * s,
            bytes_accessed=28 * 4 * rows * _LANE,
            transcendentals=8 * rows * _LANE * (s + 4),
        ),
        interpret=interpret,
    )(*scene_tables, sky6, meta3, *state)
