"""Gate math for bench.py's per-query regression table (VERDICT r8 item
3): the graded floor must flag large relative regressions on fast
queries without flagging cold-run jitter on either fast or slow ones."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
_bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_bench)
is_regression = _bench.is_regression


def test_fast_query_blowup_flags():
    # the ADVICE r7 / VERDICT r8 canonical case: 0.1s -> 0.45s is 4.5x
    # and must flag even though the absolute move is under 0.4s
    assert is_regression(0.45, 0.1)


def test_fast_query_jitter_does_not_flag():
    # 2.5x on a 0.1s query but only +0.15s: under both floors
    assert not is_regression(0.25, 0.1)


def test_slow_query_ratio_gate():
    # 1.45x with +0.45s: ratio below the 1.5x gate
    assert not is_regression(1.45, 1.0)
    # 1.6x with +0.6s: both ratio and floor exceeded
    assert is_regression(1.6, 1.0)


def test_absolute_floor_suppresses_midrange_jitter():
    # 1.8x but only +0.24s (0.3 -> 0.54): above neither floor pairing
    assert not is_regression(0.54, 0.3)
    # same base, 3x+ and +0.3s: the extreme-ratio tier flags it
    assert is_regression(0.95, 0.3)


def test_noise_baselines_never_bind():
    assert not is_regression(10.0, 0.04)
    assert not is_regression(10.0, 0.0)


def test_run_measured_modes(spark):
    # emit-all name -> hash mode (no driver transfer); others collect
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    assert _bench.run_measured(df, "events_json_extract") == "hash"
    assert _bench.run_measured(df, "revenue_by_nation") == "collect"


def test_run_measured_falls_back_on_unhashable(spark):
    # map columns can't feed xxhash64 — the mode must degrade to collect
    # (with the fallback REASON in the mode string, ADVICE r9), not fail
    # the bench row; analysis fails before execution so the timed run is
    # a clean collect
    df = spark.range(3).selectExpr("map(id, id) AS m")
    mode = _bench.run_measured(df, "events_json_extract")
    assert mode == "collect_fallback_analysis"


def test_run_measured_propagates_runtime_errors(spark):
    # a MID-EXECUTION failure must propagate (ADVICE r9): swallowing it
    # would time a partial hash attempt plus a full collect and silently
    # flip the recorded mode
    import pytest as _pytest

    df = spark.range(3).selectExpr("assert_true(id < 0) AS a")
    with _pytest.raises(Exception):
        _bench.run_measured(df, "events_json_extract")


# --- r10 additions: probe bracketing + ratio-only confirm path ----------

host_suspect = _bench.host_suspect
ratio_only_hit = _bench.ratio_only_hit


def test_host_suspect_degraded_probe_flags():
    # the r8/r9 hypervisor incident read 6-126 ms/MB (healthy < 1)
    assert host_suspect(31.5, 31.7)
    assert host_suspect(0.1, 6.3)  # degraded mid-run


def test_host_suspect_divergent_brackets_flag():
    # both nominally under the degraded bound but >4x apart: the host
    # changed state mid-run, per-query ratios are not comparable
    assert host_suspect(0.2, 1.5)


def test_host_suspect_healthy_brackets_pass():
    assert not host_suspect(0.08, 0.12)
    assert not host_suspect(0.5, 1.9)  # within margin, <4x divergence


def test_ratio_only_hit_is_the_sub_floor_band():
    # >1.5x but under the graded floor: the date_parts_orders shape
    # (VERDICT r9 item 7) — eligible for a confirm rerun, not a flag
    assert ratio_only_hit(0.36, 0.22)  # 1.64x, +0.14s
    # a full flag is NOT a ratio-only hit (it flags directly)
    assert not ratio_only_hit(1.6, 1.0)
    # under 1.5x: nothing
    assert not ratio_only_hit(0.3, 0.22)
    # sub-50ms baselines never bind anywhere
    assert not ratio_only_hit(0.04, 0.02)


def test_planted_slowdown_must_flag():
    """Gate validation (VERDICT r9 item 1): a deliberate 2x slowdown on
    any query with a >=0.4s median must trip is_regression — the planted
    case the SPARK_GRAFT_PLANT_SLOWDOWN hook injects end-to-end."""
    for median in (0.4, 0.8, 1.63, 6.0):
        assert is_regression(2.0 * median, median)
