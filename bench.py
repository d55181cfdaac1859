"""Benchmark harness: one JSON line for the driver.

Headline metric (BASELINE.json config 3): path throughput on the Shirley
cover scene (~485 live spheres, 512 static slots), 1200x800, depth 10, on
one TPU chip.  ``vs_baseline`` compares against the reference-semantics C++
CPU tracer (native/cpu_baseline — clean-room reimplementation of
ilia-glushchenko/SimplePathTracer's recursive tracer + <=4-thread tile pool,
measured on this host) since the reference publishes no numbers
(SURVEY.md S6).
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


def main():
    import jax

    import simplepathtracer_tpu as spt
    from simplepathtracer_tpu.render import accumulate, init_state

    scene = spt.cover_scene(jax.random.PRNGKey(0), max_spheres=512)
    from simplepathtracer_tpu.scenes import compact_scene
    scene = compact_scene(scene)
    camera = spt.make_camera(
        origin=(13.0, 2.0, 3.0), lookat=(0.0, 0.0, 0.0), vfov_deg=20.0,
        aperture=0.1, focus_dist=10.0,
    )
    config = spt.RenderConfig(
        width=WIDTH, height=HEIGHT, spp=BENCH_SPP, max_depth=DEPTH, spp_chunk=0,
        use_pallas=True,
    )
    key = jax.random.PRNGKey(0)

    # Warmup / compile (accumulate is jit-cached per (config, n_samples)).
    # Synchronize on a tiny slice: full-image device->host fetches crawl at
    # ~1 MB/s through the remote-TPU tunnel and would dominate the timing.
    def sync(st):
        return np.asarray(st.accum[:1, :1])

    state = init_state(config, key)
    t0 = time.time()
    state = accumulate(state, scene, camera, config, BENCH_SPP)
    sync(state)
    compile_s = time.time() - t0

    # Steady state: best of two identical (cache-hit) calls.
    dt = float("inf")
    for _ in range(2):
        t0 = time.time()
        state = accumulate(state, scene, camera, config, BENCH_SPP)
        sync(state)
        dt = min(dt, time.time() - t0)
    warm_dt = dt

    paths = WIDTH * HEIGHT * BENCH_SPP
    tpu_pps = paths / dt

    base = cpu_baseline_paths_per_sec()

    result = {
        "metric": "cover_scene_paths_per_sec_1chip",
        "value": round(tpu_pps, 1),
        "unit": "paths/s",
        "vs_baseline": round(tpu_pps / base["paths_per_sec"], 3),
        "detail": {
            "config": f"{WIDTH}x{HEIGHT}@{BENCH_SPP}spp depth={DEPTH} spheres={scene.num_spheres}",
            "device": str(jax.devices()[0]),
            "elapsed_s": round(dt, 3),
            "compile_plus_first_s": round(compile_s, 1),
            "cpu_baseline_paths_per_sec": base["paths_per_sec"],
            "use_pallas": config.use_pallas,
            # Measured separately (second compile is too slow through the
            # remote-compile tunnel to risk the driver's timeout): the
            # rr_start_depth=2 Russian-roulette variant reaches ~41.5 M
            # paths/s on the same workload (see BASELINE.md).
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
