"""Benchmark harness: one JSON line for the driver.

Emits the three north-star numbers (BASELINE.json):
  * fwd       — forward path throughput, cover scene, no Russian roulette
  * fwd_rr    — forward with rr_start_depth=2 (unbiased early termination)
  * fwd_bwd   — value_and_grad of the pixel MSE (the "training step" rate)

Headline metric/value stays the no-RR forward for round-over-round
comparability; the other two ride in detail.metrics with their own
vs_baseline.  ``vs_baseline`` compares against the reference-semantics C++
CPU tracer (native/cpu_baseline — clean-room reimplementation of
ilia-glushchenko/SimplePathTracer's recursive tracer + <=4-thread tile pool,
measured on this host) since the reference publishes no numbers
(SURVEY.md S6).

Timing discipline (CLAUDE.md): never one-shot absolute timings through the
remote-TPU tunnel — time the best of two identical cache-hit calls and
synchronize on a 1-pixel slice.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

WIDTH, HEIGHT, DEPTH = 1200, 800, 10
WARMUP_SPP = 4
BENCH_SPP = 100
# 8 spp in ONE dispatch: the fused gradient path saves 21 [spp*W*H]-sized
# f32 residual tiles per bounce (~840 MB/spp at depth 10 — 6.5 GB at 8 spp,
# inside the 15.75 GB v5e), and each jitted dispatch through the tunnel
# carries a measured ~35 ms fixed cost, so batching spp amortizes it
# (measured 7.8 -> 9.9 Mpaths/s from 1 -> 8 spp; marginal cost is flat at
# ~88.5 ms/spp).  Higher-spp steps chunk with rematerialization instead
# (grad_safe_config auto-picks; inverse.fit at preset spp measured 6.7M).
GRAD_SPP = 8


def cpu_baseline_paths_per_sec():
    """Measure (or re-measure) the C++ reference-semantics tracer."""
    exe = os.path.join(REPO, "native", "cpu_baseline")
    if not os.path.exists(exe):
        subprocess.run(
            ["make", "-C", os.path.join(REPO, "native"), "cpu_baseline"],
            check=True, capture_output=True,
        )
    out = subprocess.run(
        [exe, "300", "200", "16", str(DEPTH)],
        check=True, capture_output=True, text=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def _bench_forward(spt, accumulate, init_state, scene, camera, config, key, spp):
    """(steady-state seconds, compile+first seconds) for one accumulate."""

    def sync(st):
        return np.asarray(st.accum[:1, :1])

    state = init_state(config, key)
    t0 = time.time()
    state = accumulate(state, scene, camera, config, spp)
    sync(state)
    compile_s = time.time() - t0
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        state = accumulate(state, scene, camera, config, spp)
        sync(state)
        dt = min(dt, time.time() - t0)
    return dt, compile_s


def _bench_grad(spt, scene, camera, config, key, spp):
    """Steady-state seconds for one jitted value_and_grad of the pixel MSE."""
    import jax
    import jax.numpy as jnp

    from simplepathtracer_tpu import inverse
    from simplepathtracer_tpu.render import grad_safe_config

    # spp_chunk=spp: one unchunked dispatch (auto-chunking would insert
    # rematerialization, which benchmarks the memory-constrained variant).
    gcfg = grad_safe_config(
        config.replace(spp=spp, spp_chunk=spp)
    ).replace(rr_start_depth=0)
    params, static_scene = inverse.split_params(scene)
    target = jnp.zeros((gcfg.height, gcfg.width, 3), jnp.float32)
    vg = jax.jit(jax.value_and_grad(inverse.pixel_loss), static_argnames=("config",))

    def run():
        loss, grads = vg(params, static_scene, target, camera, gcfg, key)
        np.asarray(loss)  # sync (scalar fetch is cheap)
        return loss

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        run()
        dt = min(dt, time.time() - t0)
    return dt, compile_s


def main():
    import jax

    from simplepathtracer_tpu._cache import enable_compilation_cache

    enable_compilation_cache()

    import simplepathtracer_tpu as spt
    from simplepathtracer_tpu.render import accumulate, init_state
    from simplepathtracer_tpu.scenes import compact_scene

    scene = compact_scene(spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512))
    camera = spt.make_camera(
        origin=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0), vfov_deg=20.0,
        aperture=0.1, focus_dist=10.0,
    )
    config = spt.RenderConfig(
        width=WIDTH, height=HEIGHT, spp=BENCH_SPP, max_depth=DEPTH, spp_chunk=0,
        use_pallas=True, balance_probe_spp=2,
    )
    key = jax.random.PRNGKey(0)
    base = cpu_baseline_paths_per_sec()
    base_pps = base["paths_per_sec"]

    fwd_dt, fwd_compile = _bench_forward(
        spt, accumulate, init_state, scene, camera, config, key, BENCH_SPP
    )
    fwd_pps = WIDTH * HEIGHT * BENCH_SPP / fwd_dt

    rr_dt, rr_compile = _bench_forward(
        spt, accumulate, init_state, scene, camera,
        config.replace(rr_start_depth=2), key, BENCH_SPP,
    )
    rr_pps = WIDTH * HEIGHT * BENCH_SPP / rr_dt

    grad_dt, grad_compile = _bench_grad(spt, scene, camera, config, key, GRAD_SPP)
    grad_pps = WIDTH * HEIGHT * GRAD_SPP / grad_dt

    result = {
        "metric": "cover_scene_paths_per_sec_1chip",
        "value": round(fwd_pps, 1),
        "unit": "paths/s",
        "vs_baseline": round(fwd_pps / base_pps, 3),
        "detail": {
            "config": f"{WIDTH}x{HEIGHT}@{BENCH_SPP}spp depth={DEPTH} spheres={scene.num_spheres}",
            "device": str(jax.devices()[0]),
            "cpu_baseline_paths_per_sec": base_pps,
            "metrics": [
                {
                    "name": "fwd_paths_per_sec",
                    "value": round(fwd_pps, 1),
                    "vs_baseline": round(fwd_pps / base_pps, 3),
                    "elapsed_s": round(fwd_dt, 3),
                    "compile_plus_first_s": round(fwd_compile, 1),
                },
                {
                    "name": "fwd_rr_paths_per_sec",
                    "value": round(rr_pps, 1),
                    "vs_baseline": round(rr_pps / base_pps, 3),
                    "elapsed_s": round(rr_dt, 3),
                    "compile_plus_first_s": round(rr_compile, 1),
                    "rr_start_depth": 2,
                },
                {
                    "name": "fwd_bwd_paths_per_sec",
                    "value": round(grad_pps, 1),
                    "vs_baseline": round(grad_pps / base_pps, 3),
                    "elapsed_s": round(grad_dt, 3),
                    "compile_plus_first_s": round(grad_compile, 1),
                    "spp": GRAD_SPP,
                },
            ],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
