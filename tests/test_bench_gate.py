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
    # map columns can't feed xxhash64 — the mode must degrade to collect,
    # not fail the bench row
    df = spark.range(3).selectExpr("map(id, id) AS m")
    assert _bench.run_measured(df, "events_json_extract") == "collect"
