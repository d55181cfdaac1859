"""Round-5 fixes (VERDICT r4): bench stall-hardening, floors single-sourcing.

The round-4 driver artifact recorded fwd_bwd_sustained_rr = 2.53 Mpaths/s
(a mid-row tunnel stall on a reps=1 timing) where the adjacent balanced
sibling measured 26.9 M.  bench.py now times every row min-of-2 with a
stall-retry; these tests pin that policy against synthetic stalls.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class _FakeClock:
    """Deterministic stand-in for time.time: each run() call advances the
    clock by the next scripted duration."""

    def __init__(self, durations):
        self.durations = list(durations)
        self.now = 0.0
        self.calls = 0

    def time(self):
        return self.now

    def run(self):
        self.now += self.durations[self.calls]
        self.calls += 1


def _timed_with_clock(durations, **kw):
    clock = _FakeClock(durations)
    orig = bench.time.time
    bench.time.time = clock.time
    try:
        return bench._timed_reps(clock.run, **kw), clock.calls
    finally:
        bench.time.time = orig


def test_timed_reps_min_of_two_clean():
    (best, times), calls = _timed_with_clock([1.0, 1.1])
    assert calls == 2
    assert abs(best - 1.0) < 1e-9
    assert len(times) == 2


def test_timed_reps_synthetic_stall_cannot_poison_row():
    # A 37.9 s stall next to a 3.7 s clean rep (the BENCH_r04 failure shape,
    # scaled): the stall triggers one extra rep and the min wins.
    (best, times), calls = _timed_with_clock([37.9, 3.7, 3.8])
    assert calls == 3
    assert abs(best - 3.7) < 1e-9
    assert len(times) == 3


def test_timed_reps_stall_on_second_rep():
    (best, times), calls = _timed_with_clock([3.7, 37.9, 3.8])
    assert calls == 3
    assert abs(best - 3.7) < 1e-9


def test_timed_reps_bounded_retries():
    # Pathological: every rep disagrees — retries stop at max_reps.
    (best, _), calls = _timed_with_clock([1.0, 10.0, 100.0, 1000.0],
                                         max_reps=3)
    assert calls == 3
    assert abs(best - 1.0) < 1e-9


def test_floors_cover_every_sustained_row():
    # Every sustained/gradient row bench.py emits must have a floor, so a
    # stalled or regressed row can't pass silently (VERDICT r4 weak 6).
    expected = {
        "fwd_paths_per_sec",
        "fwd_rr_paths_per_sec",
        "fwd_bwd_paths_per_sec",
        "fwd_bwd_regen_paths_per_sec",
        "fwd_bwd_sustained_100spp_paths_per_sec",
        "fwd_bwd_sustained_rr_paths_per_sec",
        "fwd_bwd_sustained_rr_balanced_paths_per_sec",
        "fwd_bwd_sustained_soft_paths_per_sec",
        "fwd_bwd_sustained_500spp_paths_per_sec",
        "fwd_bwd_sustained_500spp_rr_paths_per_sec",
    }
    assert expected <= set(bench.FLOORS)
    src = open(os.path.join(os.path.dirname(bench.__file__), "bench.py")).read()
    for name in expected:
        assert f'"{name}"' in src


def test_perf_guard_floors_match_bench():
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "test_perf_tpu.py")
    spec = importlib.util.spec_from_file_location("_perf_guard", path)
    guard = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(guard)
    assert guard.MIN_FWD_PATHS_PER_SEC == bench.FLOORS["fwd_paths_per_sec"]
    assert (guard.MIN_FWD_BWD_SUSTAINED_RR_PATHS_PER_SEC
            == bench.FLOORS["fwd_bwd_sustained_rr_paths_per_sec"])
