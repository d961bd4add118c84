"""Mechanical window-rotation enforcement (VERDICT r8 item 2): a commit
that changes a query's optimized plan while the query is outside the
driver's 50-query correctness window must fail the test run — r8's
closing commit (standing signature tables) did exactly that to
minhash_lsh_candidates/simhash_near_dup_pairs and only the judge's own
re-check caught it. With PLAN_PINS.json pinned at window-pin time, that
commit now trips test_no_plan_changes_outside_window (both queries'
plans changed from inline signing to a standing-table scan while outside
the r8 window list)."""

from __future__ import annotations

import json
import os

import pytest

from tools.plan_pins import PIN_PATH, check, compute_all, driver_window

pytestmark = pytest.mark.skipif(
    not os.path.exists(PIN_PATH), reason="no PLAN_PINS.json pinned yet"
)


@pytest.fixture(scope="module")
def pins():
    with open(PIN_PATH) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def current(spark, pins):
    # ~2-3 min: every registered query's optimized plan at sf0.001,
    # computed ONCE per test session and shared by all tests below
    return compute_all(spark, pins.get("sf_dir", "/root/testdata/sf0.001"))


@pytest.fixture(scope="module")
def result(spark, pins, current):
    return check(spark, pins, current=current)


def test_no_plan_changes_outside_window(result):
    assert result["violations"] == [], (
        "queries changed plans while OUTSIDE the driver correctness "
        "window — add them to _DRIVER_PRIORITY's current round block and "
        f"re-pin (tools/plan_pins.py --pin): {result['violations']}"
    )


def test_window_is_exactly_fifty():
    assert len(driver_window()) == 50


def test_gate_math_flags_tampered_pin(spark, pins, current):
    """The violation logic itself: flip one out-of-window pin and the
    check must flag exactly that query (the 8293a67 shape — a real plan
    change outside the window is indistinguishable from this)."""
    window = set(driver_window(pins.get("window_size", 50)))
    outside = next(
        n for n in pins["fingerprints"] if n not in window
    )
    tampered = {
        **pins,
        "fingerprints": {**pins["fingerprints"], outside: "0" * 32},
    }
    res = check(spark, tampered, current=current)
    assert outside in res["violations"]


# NOTE: pin/check protocol — run `python tools/plan_pins.py --pin` in a
# QUIET environment (no concurrent sessions sharing spark-warehouse; a
# contaminated pin shows up as a mass of spurious violations — re-pin),
# immediately after editing _DRIVER_PRIORITY for a new round.
