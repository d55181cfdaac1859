"""Benchmark harness: one JSON line for the driver — wedge-proof.

Emits the north-star numbers (BASELINE.json):
  * fwd                — forward throughput, cover scene, no Russian roulette
  * fwd_rr             — forward with rr_start_depth=2 (unbiased early term)
  * fwd_bwd            — value_and_grad of pixel MSE, 8 spp in one dispatch
                         (per-bounce fused kernels: the regen A/B baseline)
  * fwd_bwd_regen      — same dispatch on the regeneration kernels (the
                         default TPU gradient path since round 3)
  * fwd_bwd_sustained  — default path at the full 100-spp preset
                         (spp-chunked: what `spt-render invert` sustains),
                         with the phase A / phase B decomposition of the
                         streamed-idx schedule in the same row
  * fwd_bwd_sustained_rr   — ditto with Russian roulette (the invert
                         default since round 4; measured 1.22x), plus a
                         _balanced variant (cost-balanced lanes + 16
                         banks: the exact invert-CLI configuration)
  * fwd_bwd_sustained_soft — ditto with the soft-silhouette blend
                         (geometry-fit config; prices the in-bounce blend)
  * fwd_bwd_sustained_500spp — the BASELINE.json metric's own 500-spp
                         workload (streamed via packed idx planes), plus
                         a _rr variant (the production fit default)
  * fwd_reference_scene — S=10 forward (overhead-dominated regime)
  * vpu_utilization    — achieved sphere-scan VPU tile-ops/cycle vs the
                         measured ~2.3 issue ceiling (the roofline check on
                         the "algorithm ceiling" claim, SURVEY.md S6)

Headline metric/value stays the no-RR forward for round-over-round
comparability; the rest ride in detail.metrics.  ``vs_baseline`` compares
against the reference-semantics C++ CPU tracer (native/cpu_baseline —
clean-room reimplementation of ilia-glushchenko/SimplePathTracer's
recursive tracer + <=4-thread tile pool, measured on this host) since the
reference publishes no numbers (SURVEY.md S6; its only instrumentation is
the wall-clock printout, include/Renderer.hpp:294-299).

Failure discipline (round-2 lesson: BENCH_r02.json was an unparseable
traceback because the axon tunnel was wedged):
  * the TPU backend is probed in a SUBPROCESS under a timeout before any
    in-process jax work, retried once after a cooldown;
  * every metric runs in its own try/except — a late failure still emits
    the already-measured numbers;
  * exactly ONE JSON line is printed no matter what; on failure it carries
    an "error" field plus whatever partial metrics exist;
  * partial results are also mirrored to BENCH_partial.json after every
    metric, so even a hard kill (driver timeout) leaves evidence.

Timing discipline (CLAUDE.md): never one-shot absolute timings through the
remote-TPU tunnel — time the best of two identical cache-hit calls and
synchronize on a 1-pixel slice / scalar fetch.

Stall hardening (round-5, VERDICT r4 weak 1: BENCH_r04 recorded a 2.53 M
fwd_bwd_sustained_rr row — a tunnel stall on a reps=1 timing — where the
adjacent balanced sibling measured 26.9 M):
  * EVERY row is min-of-2 identical cache-hit calls (previously the
    sustained rows were reps=1);
  * if the two reps disagree by >2.5x (a mid-row tunnel stall), one extra
    rep runs and the min wins; all rep times ship in the row
    ("rep_times_s") so a stall is visible, not silent;
  * each row is compared against the perf floors shared with
    tests/test_perf_tpu.py (FLOORS below, ~0.7x of driver-verified round-4
    numbers); rows below floor are listed in detail["regressions"].
"""

import json
import os
import subprocess
import sys
import time
import traceback

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

WIDTH, HEIGHT, DEPTH = 1200, 800, 10
BENCH_SPP = 100
# 8 spp in ONE dispatch: the fused gradient path saves per-(ray, bounce)
# f32 residual tiles (~6.5 GB at 8 spp, inside the 15.75 GB v5e), and each
# jitted dispatch through the tunnel carries a measured ~35 ms fixed cost,
# so batching spp amortizes it (measured 7.8 -> 9.9 Mpaths/s from 1 -> 8
# spp).  Higher-spp steps chunk with rematerialization instead
# (grad_safe_config auto-picks) — that sustained rate is the
# fwd_bwd_sustained_100spp row.
GRAD_SPP = 8
SUSTAINED_SPP = 100
# The BASELINE.json metric line is fwd+bwd at 500 spp: round 4's packed
# idx planes (3 x 10-bit winners per word) fit 500 spp in the streamed
# path's budget, so this row runs the north-star workload directly.
NORTH_STAR_SPP = 500
PROBE_TIMEOUT_S = 170   # tiny-op probe budget (device init, no Mosaic compile)
PROBE_COOLDOWN_S = 120  # wait before the one retry when the probe fails

# Roofline constants for vpu_utilization.  The sphere scan issues ~35 VPU
# ops per sphere per (8,128) ray tile (ops/pallas_common.closest_hit_scan:
# 3 sub + 5+5 dot/fma + 2 disc + sqrt + 3 t-select + 3 cmp/and + 12 winner
# selects); the measured issue ceiling after the 16x unroll is ~2.3
# tile-ops/cycle at the assumed 940 MHz v5e TensorCore clock (CLAUDE.md,
# experiments/unroll_bench.py).  utilization = useful scan ops / (ceiling x
# elapsed): "useful" counts live-lane iterations only, so residual
# straggler waste shows up as utilization < 1.
OPS_PER_SPHERE = 35
CLOCK_HZ = 0.94e9
CEILING_OPS_PER_CYCLE = 2.3

PARTIAL_PATH = os.path.join(REPO, "BENCH_partial.json")

# Regression floors (paths/s), shared with tests/test_perf_tpu.py (which
# imports this dict).  ~0.7x the round-4 driver-verified numbers: loose
# enough for machine variance, tight enough that a path falling back to a
# slower schedule (or a stalled row) is flagged in detail["regressions"].
FLOORS = {
    "fwd_paths_per_sec": 30e6,                             # measured 43.8M
    "fwd_rr_paths_per_sec": 38e6,                          # measured 54.9M
    "fwd_bwd_paths_per_sec": 7e6,                          # measured 11.0M
    "fwd_bwd_regen_paths_per_sec": 15e6,                   # measured 23.8M
    "fwd_bwd_sustained_100spp_paths_per_sec": 14e6,        # measured 21.1M
    "fwd_bwd_sustained_rr_paths_per_sec": 17e6,            # measured 25.6M
    "fwd_bwd_sustained_rr_balanced_paths_per_sec": 17e6,   # measured 26.9M
    # Round 5: soft = the TWO-SIDED stochastic-transparency estimator
    # (correct visibility gradients; the one-sided blend measured 21.0M
    # with AD/FD = 0.49 — not comparable).  Measured 15.7M on chip;
    # 14.8M with the late-round-5 intersection-edge coins (crossing +
    # validity — BASELINE.md late round 5).
    "fwd_bwd_sustained_soft_paths_per_sec": 10e6,
    "fwd_bwd_sustained_500spp_paths_per_sec": 14e6,        # measured 21.2M
    "fwd_bwd_sustained_500spp_rr_paths_per_sec": 17e6,     # measured 25.8M
}
# One mid-row tunnel stall makes a rep >2.5x its sibling; a real config
# regression is flat across reps.  One extra rep disambiguates.
STALL_RATIO = 2.5


def _timed_reps(run, reps=2, max_reps=3):
    """Min-of-reps timing with a stall-retry: returns (best_s, [rep times]).

    ``run`` must be a post-compile cache-hit call that synchronizes on a
    tiny fetch.  If the observed reps disagree by more than STALL_RATIO
    (tunnel stall mid-row), one extra rep runs; the min is the measurement
    and every rep time is reported so stalls are visible in the artifact.
    """
    times = []
    for _ in range(max(reps, 2)):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    while max(times) / min(times) > STALL_RATIO and len(times) < max_reps:
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return min(times), [round(t, 3) for t in times]


def cpu_baseline_paths_per_sec():
    """Measure (or re-measure) the C++ reference-semantics tracer."""
    exe = os.path.join(REPO, "native", "cpu_baseline")
    if not os.path.exists(exe):
        subprocess.run(
            ["make", "-C", os.path.join(REPO, "native"), "cpu_baseline"],
            check=True, capture_output=True,
        )
    # Best of two runs: a single ~2 s measurement is noisy enough (±25%
    # observed across driver runs) to wobble every vs_baseline column.
    best = None
    for _ in range(2):
        out = subprocess.run(
            [exe, "300", "200", "16", str(DEPTH)],
            check=True, capture_output=True, text=True,
        ).stdout
        r = json.loads(out.strip().splitlines()[-1])
        if best is None or r["paths_per_sec"] > best["paths_per_sec"]:
            best = r
    return best


def probe_backend(timeout_s=PROBE_TIMEOUT_S):
    """Health-check the TPU backend in a subprocess under a timeout.

    A wedged axon tunnel hangs even jnp.ones((8,128))+1 (round-2 failure
    mode); probing in-process would hang bench.py itself.  The probe is a
    tiny op (device init only, no Mosaic kernel compile), so killing it on
    timeout is the least-risk option available.
    """
    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = jnp.ones((8,128)) + 1;"
        "assert float(np.asarray(x[:1,:1]).ravel()[0]) == 2.0;"
        "print('BACKEND_OK', jax.devices()[0])"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return r.returncode == 0 and "BACKEND_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _bench_forward(accumulate, init_state, scene, camera, config, key, spp):
    """(steady-state seconds, compile+first seconds) for one accumulate."""

    def sync(st):
        return np.asarray(st.accum[:1, :1])

    state = init_state(config, key)
    t0 = time.time()
    state = accumulate(state, scene, camera, config, spp)
    sync(state)
    compile_s = time.time() - t0

    def run():
        sync(accumulate(state, scene, camera, config, spp))

    dt, rep_times = _timed_reps(run)
    return dt, compile_s, rep_times


def _bench_grad(scene, camera, config, key, spp, spp_chunk, reps=2,
                regen=None, rr=0, fwd_only=False, balance=False):
    """Steady-state seconds for one jitted value_and_grad of the pixel MSE.

    ``fwd_only=True`` times the loss FORWARD alone (no grad) under the
    identical config — on the streamed gradient path that is phase A (the
    idx-recording forward) + loss arithmetic, so (grad_dt - fwd_dt) is
    phase B (scan-free re-forward + backward + bucket): the decomposition
    the round-3 VERDICT asked to make driver-visible.  ``rr`` sets
    rr_start_depth (gradients under Russian roulette are unbiased and
    equivalence-tested)."""
    import jax
    import jax.numpy as jnp

    from simplepathtracer_tpu import inverse
    from simplepathtracer_tpu.render import grad_safe_config

    # spp_chunk=spp benches one unchunked dispatch; spp_chunk=0 lets
    # grad_safe_config pick the rematerialization chunking (the
    # memory-bounded variant the CLI fit actually runs).  regen selects
    # the regeneration gradient kernels (ops/pallas_grad_regen.py);
    # None keeps grad_safe_config's default (regen on TPU).
    gcfg = grad_safe_config(
        config.replace(spp=spp, spp_chunk=spp_chunk)
    ).replace(rr_start_depth=rr)
    if regen is not None:
        gcfg = gcfg.replace(grad_regen=regen)
    if balance:
        # The production invert configuration: cost-balanced pixel order
        # + 16 banks (measured best together; cli._invert_preset pins it).
        from simplepathtracer_tpu.render import balanced_pixel_perm

        gcfg = gcfg.replace(grad_regen_banks=16)
        perm = balanced_pixel_perm(scene, camera, gcfg, key)
    else:
        perm = None
    params, static_scene = inverse.split_params(scene)
    target = jnp.zeros((gcfg.height, gcfg.width, 3), jnp.float32)
    if fwd_only:
        fn = jax.jit(inverse.pixel_loss, static_argnames=("config", "leaves"))
    else:
        fn = jax.jit(
            jax.value_and_grad(inverse.pixel_loss),
            static_argnames=("config", "leaves"),
        )

    def run():
        out = fn(params, static_scene, target, camera, gcfg, key,
                 leaves=inverse.DIFF_LEAVES, pixel_perm=perm)
        loss = out[0] if isinstance(out, tuple) else out
        np.asarray(loss)  # sync (scalar fetch is cheap)
        return loss

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    dt, rep_times = _timed_reps(run, reps=reps)
    return dt, compile_s, rep_times


def _measure_scan_iters(scene, camera, config, key, probe_spp=2):
    """Total live-lane kernel iterations per spp (the utilization probe).

    Uses the persistent kernel's iteration counters (the same signal that
    drives adaptive lane balancing).  Summed on-device; only the scalar
    crosses the tunnel.
    """
    import jax.numpy as jnp

    from simplepathtracer_tpu.render import _render_block_pallas

    pixel_ids = jnp.arange(config.num_pixels, dtype=jnp.int32)
    _, counts = _render_block_pallas(
        scene, camera, config, key, pixel_ids, 0, probe_spp,
        return_counts=True,
    )
    total = float(np.asarray(jnp.sum(counts)))
    return total / probe_spp


def emit(result, partial_only=False):
    blob = json.dumps(result)
    try:
        with open(PARTIAL_PATH, "w") as f:
            f.write(blob + "\n")
    except OSError:
        pass
    if not partial_only:
        print(blob)


def main():
    metrics = []
    errors = []
    regressions = []
    detail = {
        "config": f"{WIDTH}x{HEIGHT}@{BENCH_SPP}spp depth={DEPTH}",
        "metrics": metrics,
        "regressions": regressions,
    }
    result = {
        "metric": "cover_scene_paths_per_sec_1chip",
        "value": 0.0,
        "unit": "paths/s",
        "vs_baseline": 0.0,
        "detail": detail,
    }

    def fail(err):
        result["error"] = err
        if errors:
            detail["errors"] = errors
        emit(result)
        return 1

    # --- backend health gate (round-2 failure mode: wedged axon tunnel) ---
    if not probe_backend():
        time.sleep(PROBE_COOLDOWN_S)
        if not probe_backend():
            return fail("tpu_unavailable: backend probe failed twice "
                        f"(timeout {PROBE_TIMEOUT_S}s, cooldown {PROBE_COOLDOWN_S}s)")

    try:
        base_pps = cpu_baseline_paths_per_sec()["paths_per_sec"]
    except Exception as e:  # baseline is informative, not load-bearing
        errors.append(f"cpu_baseline: {e!r}")
        base_pps = None
    detail["cpu_baseline_paths_per_sec"] = base_pps

    def vs(x):
        return round(x / base_pps, 3) if base_pps else None

    def add_row(row, rep_times=None):
        """Append a metric row; flag it in detail["regressions"] if it
        lands below its test_perf_tpu.py floor (VERDICT r4 weak 6)."""
        if rep_times is not None:
            row["rep_times_s"] = rep_times
        floor = FLOORS.get(row["name"])
        if floor is not None and row["value"] < floor:
            row["floor"] = floor
            regressions.append(row["name"])
        metrics.append(row)
        emit(result, partial_only=True)

    try:
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
            width=WIDTH, height=HEIGHT, spp=BENCH_SPP, max_depth=DEPTH,
            spp_chunk=0, use_pallas=True, balance_probe_spp=2,
        )
        key = jax.random.PRNGKey(0)
        detail["config"] += f" spheres={scene.num_spheres}"
        detail["device"] = str(jax.devices()[0])
    except Exception as e:
        return fail(f"setup: {e!r}\n{traceback.format_exc(limit=3)}")

    # --- fwd (headline) ----------------------------------------------------
    try:
        fwd_dt, fwd_compile, fwd_reps = _bench_forward(
            accumulate, init_state, scene, camera, config, key, BENCH_SPP
        )
        fwd_pps = WIDTH * HEIGHT * BENCH_SPP / fwd_dt
        result["value"] = round(fwd_pps, 1)
        result["vs_baseline"] = vs(fwd_pps) or 0.0
        add_row({
            "name": "fwd_paths_per_sec", "value": round(fwd_pps, 1),
            "vs_baseline": vs(fwd_pps), "elapsed_s": round(fwd_dt, 3),
            "compile_plus_first_s": round(fwd_compile, 1),
        }, fwd_reps)
    except Exception as e:
        errors.append(f"fwd: {e!r}")
        fwd_dt = None

    # --- vpu utilization (roofline check on the fwd number) ----------------
    if fwd_dt is not None:
        try:
            iters_per_spp = _measure_scan_iters(scene, camera, config, key)
            s_pad = -(-scene.num_spheres // 16) * 16
            scan_ops = iters_per_spp * BENCH_SPP / 1024.0 * s_pad * OPS_PER_SPHERE
            ops_per_cycle = scan_ops / (fwd_dt * CLOCK_HZ)
            metrics.append({
                "name": "vpu_utilization",
                "value": round(ops_per_cycle / CEILING_OPS_PER_CYCLE, 3),
                "ops_per_cycle": round(ops_per_cycle, 3),
                "ceiling_ops_per_cycle": CEILING_OPS_PER_CYCLE,
                "ops_per_sphere": OPS_PER_SPHERE,
                "assumed_clock_ghz": CLOCK_HZ / 1e9,
                "live_iters_per_path": round(
                    iters_per_spp / (WIDTH * HEIGHT), 3
                ),
            })
            emit(result, partial_only=True)
        except Exception as e:
            errors.append(f"vpu_utilization: {e!r}")

    # --- fwd + Russian roulette --------------------------------------------
    try:
        rr_dt, rr_compile, rr_reps = _bench_forward(
            accumulate, init_state, scene, camera,
            config.replace(rr_start_depth=2), key, BENCH_SPP,
        )
        rr_pps = WIDTH * HEIGHT * BENCH_SPP / rr_dt
        add_row({
            "name": "fwd_rr_paths_per_sec", "value": round(rr_pps, 1),
            "vs_baseline": vs(rr_pps), "elapsed_s": round(rr_dt, 3),
            "compile_plus_first_s": round(rr_compile, 1), "rr_start_depth": 2,
        }, rr_reps)
    except Exception as e:
        errors.append(f"fwd_rr: {e!r}")

    # --- fwd+bwd, one unchunked 8-spp dispatch (per-bounce fused kernels,
    # the regen A/B baseline) -------------------------------------------------
    try:
        grad_dt, grad_compile, grad_reps = _bench_grad(
            scene, camera, config, key, GRAD_SPP, spp_chunk=GRAD_SPP,
            regen=False,
        )
        grad_pps = WIDTH * HEIGHT * GRAD_SPP / grad_dt
        add_row({
            "name": "fwd_bwd_paths_per_sec", "value": round(grad_pps, 1),
            "vs_baseline": vs(grad_pps), "elapsed_s": round(grad_dt, 3),
            "compile_plus_first_s": round(grad_compile, 1), "spp": GRAD_SPP,
        }, grad_reps)
    except Exception as e:
        errors.append(f"fwd_bwd: {e!r}")

    # --- fwd+bwd, regeneration kernels (same dispatch shape) ----------------
    try:
        rg_dt, rg_compile, rg_reps = _bench_grad(
            scene, camera, config, key, GRAD_SPP, spp_chunk=GRAD_SPP, regen=True
        )
        rg_pps = WIDTH * HEIGHT * GRAD_SPP / rg_dt
        add_row({
            "name": "fwd_bwd_regen_paths_per_sec", "value": round(rg_pps, 1),
            "vs_baseline": vs(rg_pps), "elapsed_s": round(rg_dt, 3),
            "compile_plus_first_s": round(rg_compile, 1), "spp": GRAD_SPP,
        }, rg_reps)
    except Exception as e:
        errors.append(f"fwd_bwd_regen: {e!r}")

    # --- fwd+bwd sustained at the 100-spp preset (default gradient path:
    # regen kernels, grad_safe_config-chunked) -------------------------------
    try:
        sus_dt, sus_compile, sus_reps = _bench_grad(
            scene, camera, config, key, SUSTAINED_SPP, spp_chunk=0
        )
        sus_pps = WIDTH * HEIGHT * SUSTAINED_SPP / sus_dt
        row = {
            "name": "fwd_bwd_sustained_100spp_paths_per_sec",
            "value": round(sus_pps, 1), "vs_baseline": vs(sus_pps),
            "elapsed_s": round(sus_dt, 3),
            "compile_plus_first_s": round(sus_compile, 1),
            "spp": SUSTAINED_SPP,
        }
        # Decomposition (round-3 VERDICT weak 2): the loss FORWARD alone is
        # phase A (idx-recording forward + loss arithmetic); the remainder
        # is phase B (scan-free re-forward + backward + bucket).  Ceilings:
        # phase A's is the pure forward row (fwd_paths_per_sec — streaming
        # one idx plane was measured +19 ms over it at bench scale); phase
        # B's VPU work is the bounce vjp, not a sphere scan, so its
        # achieved rate is reported for regression tracking rather than
        # against a scan roofline.
        try:
            pa_dt, _, _ = _bench_grad(
                scene, camera, config, key, SUSTAINED_SPP, spp_chunk=0,
                fwd_only=True,
            )
            row["phase_a_s"] = round(pa_dt, 3)
            row["phase_b_s"] = round(sus_dt - pa_dt, 3)
            row["phase_a_paths_per_sec"] = round(
                WIDTH * HEIGHT * SUSTAINED_SPP / pa_dt, 1
            )
            row["phase_b_paths_per_sec"] = round(
                WIDTH * HEIGHT * SUSTAINED_SPP / max(sus_dt - pa_dt, 1e-9), 1
            )
        except Exception as e:  # decomposition is informative
            errors.append(f"sustained_decomposition: {e!r}")
        add_row(row, sus_reps)
    except Exception as e:
        errors.append(f"fwd_bwd_sustained: {e!r}")

    # --- fwd+bwd sustained with Russian roulette (VERDICT r3 weak 3:
    # forward RR is a measured 1.25x; gradients under RR are unbiased and
    # equivalence-tested — measure whether invert should default it) ------
    try:
        rrg_dt, rrg_compile, rrg_reps = _bench_grad(
            scene, camera, config, key, SUSTAINED_SPP, spp_chunk=0, rr=2,
        )
        rrg_pps = WIDTH * HEIGHT * SUSTAINED_SPP / rrg_dt
        add_row({
            "name": "fwd_bwd_sustained_rr_paths_per_sec",
            "value": round(rrg_pps, 1), "vs_baseline": vs(rrg_pps),
            "elapsed_s": round(rrg_dt, 3),
            "compile_plus_first_s": round(rrg_compile, 1),
            "spp": SUSTAINED_SPP, "rr_start_depth": 2,
        }, rrg_reps)
    except Exception as e:
        errors.append(f"fwd_bwd_sustained_rr: {e!r}")

    # --- fwd+bwd sustained, BALANCED + RR (the exact configuration the
    # invert CLI runs on TPU: cost-balanced pixel order + 16 banks) -------
    try:
        bal_dt, bal_compile, bal_reps = _bench_grad(
            scene, camera, config, key, SUSTAINED_SPP, spp_chunk=0,
            rr=2, balance=True,
        )
        bal_pps = WIDTH * HEIGHT * SUSTAINED_SPP / bal_dt
        add_row({
            "name": "fwd_bwd_sustained_rr_balanced_paths_per_sec",
            "value": round(bal_pps, 1), "vs_baseline": vs(bal_pps),
            "elapsed_s": round(bal_dt, 3),
            "compile_plus_first_s": round(bal_compile, 1),
            "spp": SUSTAINED_SPP, "rr_start_depth": 2, "banks": 16,
        }, bal_reps)
    except Exception as e:
        errors.append(f"fwd_bwd_sustained_rr_balanced: {e!r}")

    # --- fwd+bwd sustained WITH soft silhouettes (geometry-fit config):
    # the in-bounce blend (round 4) keeps geometry recovery on the
    # streamed kernels — this row prices the blend vs the plain row ------
    try:
        sil_dt, sil_compile, sil_reps = _bench_grad(
            scene, camera, config.replace(silhouette_softness=0.02), key,
            SUSTAINED_SPP, spp_chunk=0,
        )
        sil_pps = WIDTH * HEIGHT * SUSTAINED_SPP / sil_dt
        add_row({
            "name": "fwd_bwd_sustained_soft_paths_per_sec",
            "value": round(sil_pps, 1), "vs_baseline": vs(sil_pps),
            "elapsed_s": round(sil_dt, 3),
            "compile_plus_first_s": round(sil_compile, 1),
            "spp": SUSTAINED_SPP, "silhouette_softness": 0.02,
        }, sil_reps)
    except Exception as e:
        errors.append(f"fwd_bwd_sustained_soft: {e!r}")

    # --- fwd+bwd sustained at the NORTH-STAR 500 spp (BASELINE.json's own
    # metric line; packed idx planes keep the streamed path engaged) ------
    try:
        ns_dt, ns_compile, ns_reps = _bench_grad(
            scene, camera, config, key, NORTH_STAR_SPP, spp_chunk=0
        )
        ns_pps = WIDTH * HEIGHT * NORTH_STAR_SPP / ns_dt
        add_row({
            "name": "fwd_bwd_sustained_500spp_paths_per_sec",
            "value": round(ns_pps, 1), "vs_baseline": vs(ns_pps),
            "elapsed_s": round(ns_dt, 3),
            "compile_plus_first_s": round(ns_compile, 1),
            "spp": NORTH_STAR_SPP,
        }, ns_reps)
    except Exception as e:
        errors.append(f"fwd_bwd_sustained_500spp: {e!r}")

    # --- the same 500-spp workload with Russian roulette (the production
    # fit default): the headline gradient number ---------------------------
    try:
        nsr_dt, nsr_compile, nsr_reps = _bench_grad(
            scene, camera, config, key, NORTH_STAR_SPP, spp_chunk=0, rr=2,
        )
        nsr_pps = WIDTH * HEIGHT * NORTH_STAR_SPP / nsr_dt
        add_row({
            "name": "fwd_bwd_sustained_500spp_rr_paths_per_sec",
            "value": round(nsr_pps, 1), "vs_baseline": vs(nsr_pps),
            "elapsed_s": round(nsr_dt, 3),
            "compile_plus_first_s": round(nsr_compile, 1),
            "spp": NORTH_STAR_SPP, "rr_start_depth": 2,
        }, nsr_reps)
    except Exception as e:
        errors.append(f"fwd_bwd_sustained_500spp_rr: {e!r}")

    # --- reference scene (S=10) forward row: the scan is ~50x lighter, so
    # per-iteration overhead dominates — a different regime to guard
    # (VERDICT r3 weak 7).  Same image shape for comparability. ----------
    try:
        import simplepathtracer_tpu as _spt

        ref_scene = _spt.reference_scene()
        ref_cam = _spt.make_camera(
            origin=(0, 1, -3), lookat=(0, 1, 0), vfov_deg=90
        )
        ref_dt, ref_compile, ref_reps = _bench_forward(
            accumulate, init_state, ref_scene, ref_cam, config, key, BENCH_SPP
        )
        ref_pps = WIDTH * HEIGHT * BENCH_SPP / ref_dt
        add_row({
            "name": "fwd_reference_scene_paths_per_sec",
            "value": round(ref_pps, 1), "elapsed_s": round(ref_dt, 3),
            "compile_plus_first_s": round(ref_compile, 1),
            "spheres": int(ref_scene.num_spheres),
        }, ref_reps)
    except Exception as e:
        errors.append(f"fwd_reference_scene: {e!r}")

    if errors:
        detail["errors"] = errors
    if result["value"] == 0.0:
        return fail("no_headline_metric")
    emit(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
