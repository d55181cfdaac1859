"""Standalone replica of the jnp soft bounce (1 sphere + ground plane,
depth 2, Lambertian) for dissecting the crossing-estimator bias.

Reproduces render.py's soft+plane bounce formula-for-formula on a vertical
fan of rays crossing the intersection circle, with real depth-2 Lambertian
continuations and the sky miss shader, so AD-vs-FD mismatches can be
ablated term by term without re-tracing the full renderer.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/r5_crossing_replica.py

Historical note: this replica's ablations located the two missing terms
that became production estimators — the crossing coin (this file's
bounce) and the t_min VALIDITY coin (v5 variant, developed in-session:
AD/FD 0.98 once the blocker factor dropped its erroneous hit_any gate).
The final design, including the previous-winner hard gate that keeps the
validity coin from re-validating self-hits, lives in ops/intersect.py /
ops/pallas_common.py and is summarized in BASELINE.md (late round 5).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
jax.config.update("jax_platforms", "cpu")

from simplepathtracer_tpu.ops.intersect import (  # noqa: E402
    SIL_P_FLOOR, crossing_scale, grad_capped_sqrt, silhouette_logit,
    silhouette_scale,
)

T_MIN, T_MAX = 1e-3, 3.0e7
SKY_LO = jnp.array([1.0, 1.0, 1.0], jnp.float32)
SKY_HI = jnp.array([0.5, 0.7, 1.0], jnp.float32)
ALB_S = jnp.array([0.1, 0.2, 0.5], jnp.float32)
ALB_P = jnp.array([246 / 255.0, 219 / 255.0, 219 / 255.0], jnp.float32)
PK = 0.5          # plane y = -0.5  (n = (0,1,0), k = 0.5)
CX = jnp.array([0.0, -0.5, 1.0], jnp.float32)


def sky(d):
    s = 0.5 * (d[:, 1:2] + 1.0)
    return SKY_LO + (SKY_HI - SKY_LO) * s


def normalize(v):
    return v / jnp.sqrt(jnp.sum(v * v, -1, keepdims=True) + 1e-20)


def unit_sphere(u0, u1):
    z = 1.0 - 2.0 * u0
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = (2.0 * np.pi) * u1
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)


def bounce(o, d, tp, rad, alive, r, u, soft, dbg):
    """One soft bounce; u: [N, 5] uniforms (coin7, cross, lam0, lam1, spare)."""
    c = CX
    oc = c[None, :] - o
    tc = jnp.sum(oc * d, -1)
    disc = r * r - (jnp.sum(oc * oc, -1) - tc * tc)
    ssc = silhouette_scale(soft, r)
    thr = silhouette_logit(u[:, 0]) * ssc
    sq = grad_capped_sqrt(jnp.maximum(disc, 1e-12), ssc)
    tn = tc - sq
    t_s = jnp.where(tn > T_MIN, tn, tc + sq)
    accept = (disc > thr) & (t_s > T_MIN) & (t_s < T_MAX)
    s_hit = accept

    # plane
    den_p = d[:, 1]
    t_p = -(o[:, 1] + PK) / jnp.where(jnp.abs(den_p) > 1e-8, den_p, 1.0)
    ph_hit = (jnp.abs(den_p) > 1e-8) & (t_p > T_MIN) & (t_p < T_MAX)

    # crossing coin
    sigx = crossing_scale(soft, jax.lax.stop_gradient(r))
    thr_x = silhouette_logit(u[:, 1]) * sigx
    pw = ph_hit & ~(s_hit & (t_s < t_p + thr_x))
    cross_valid = ph_hit & s_hit
    hit_any = s_hit | pw
    t_hit = jnp.where(pw, t_p, jnp.where(s_hit, t_s, T_MAX))

    point = o + t_hit[:, None] * d
    n_s = normalize(point - c[None, :])
    n_p = jnp.where(den_p[:, None] > 0, -1.0, 1.0) * jnp.array([[0.0, 1.0, 0.0]])
    n = jnp.where(pw[:, None], n_p, n_s)
    alb = jnp.where(pw[:, None], ALB_P[None, :], ALB_S[None, :])

    # ratio
    xsw = jnp.clip(disc / (ssc + 1e-12), -30.0, 30.0)
    sphere_win = alive & s_hit & ~pw
    w = jax.nn.sigmoid(xsw)
    we = jnp.where(sphere_win, w, 1.0)
    # blocker (single sphere: rejected & would-be-front of the winner)
    sqb = jnp.sqrt(jnp.maximum(disc, 1e-12))
    tnb = tc - sqb
    t_b = jnp.where(tnb > T_MIN, tnb, tc + sqb)
    bvalid = (~accept) & alive & (t_b < t_hit) & (t_b > T_MIN)
    m = jnp.where(bvalid, w, 0.0)
    if "no_wm" in dbg:
        we, m = jax.lax.stop_gradient((we, m))
    p_out = we - m
    sqw = grad_capped_sqrt(jnp.maximum(disc, 1e-12), ssc)
    tnw = tc - sqw
    t_w = jnp.where(tnw > T_MIN, tnw, tc + sqw)
    sigxd = crossing_scale(soft, r)
    qx = jax.nn.sigmoid(jnp.clip((t_p - t_w) / (sigxd + 1e-12), -30.0, 30.0))
    qf = jnp.where(pw, 1.0 - qx, qx)
    qf = jnp.where(cross_valid & alive, qf, 1.0)
    if "no_qf" in dbg:
        qf = jax.lax.stop_gradient(qf)
    den = jnp.maximum(p_out, SIL_P_FLOOR) * qf
    tp = tp * (den / jax.lax.stop_gradient(den))[:, None]

    miss = alive & ~hit_any
    rad = rad + tp * sky(d) * miss[:, None]
    live = alive & hit_any
    # Lambertian scatter
    front = jnp.sum(d * n, -1) < 0.0
    n_face = jnp.where(front[:, None], n, -n)
    new_d = normalize(n_face + unit_sphere(u[:, 2], u[:, 3]))
    tp = jnp.where(live[:, None], tp * alb, tp)
    o = jnp.where(live[:, None], point, o)
    d = jnp.where(live[:, None], new_d, d)
    return o, d, tp, rad, live


def run(r, U, soft, depth=2, dbg=()):
    n = U.shape[0]
    cam_o = jnp.array([0.0, 0.1, -0.2], jnp.float32)
    aim_z = 0.55 + 0.15 * U[:, -1]
    tgt = jnp.stack([jnp.zeros(n), jnp.full((n,), -0.5), aim_z], -1)
    d = normalize(tgt - cam_o[None, :])
    o = jnp.broadcast_to(cam_o, (n, 3))
    tp = jnp.ones((n, 3), jnp.float32)
    rad = jnp.zeros((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    for b in range(depth):
        soft_b = 0.0 if ("hard_b%d" % b) in dbg else soft
        o, d, tp, rad, alive = bounce(
            o, d, tp, rad, alive, r, U[:, 5 * b:5 * b + 5], soft_b, dbg
        )
    return jnp.mean(rad)


def main(n=400_000, soft=0.05, eps=3e-3, depth=2, seed=0):
    rng = np.random.default_rng(seed)
    U = jnp.asarray(rng.random((n, 5 * depth + 1), np.float32))
    r0 = jnp.float32(0.4)

    for dbg in ((), ("hard_b1",), ("hard_b0",), ("no_qf",), ("no_wm",)):
        f = jax.jit(lambda r: run(r, U, soft, depth, dbg))
        ad = float(jax.grad(f)(r0))
        fd = (float(f(r0 + eps)) - float(f(r0 - eps))) / (2 * eps)
        print(f"dbg={dbg!s:22s} AD={ad:+.5f} FD={fd:+.5f} ratio={ad / fd:+.4f}")


if __name__ == "__main__":
    main()
