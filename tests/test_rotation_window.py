"""Mechanical window-rotation enforcement (VERDICT r8 item 2): a commit
that changes a query's optimized plan while the query is outside the
driver's 50-query correctness window must fail the test run — r8's
closing commit (standing signature tables) did exactly that to
minhash_lsh_candidates/simhash_near_dup_pairs and only the judge's own
re-check caught it. With PLAN_PINS.json pinned at window-pin time, that
commit now trips test_no_plan_changes_outside_window.

Fingerprints are context-sensitive (a query's captured plan depends on
which session caches already exist when it builds), so they are only
comparable when computed the way the pin was: a FRESH session running
the catalog in registry order. The fixture therefore shells out to
``tools/plan_pins.py --check`` in a subprocess instead of computing in
the (cache-warm, test-order-dependent) pytest session."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from tools.plan_pins import PIN_PATH, check, driver_window

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(PIN_PATH), reason="no PLAN_PINS.json pinned yet"
)


@pytest.fixture(scope="module")
def pins():
    with open(PIN_PATH) as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def subprocess_check(tmp_path_factory):
    """(check result, current fingerprints) from a fresh-session run of
    the tool — ~2-3 min, once per test session."""
    dump = str(tmp_path_factory.mktemp("pins") / "current.json")
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "plan_pins.py"),
            "--check",
            "--dump-current",
            dump,
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    # rc 1 == violations found; anything else is a harness failure
    assert proc.returncode in (0, 1), proc.stderr[-2000:]
    start = proc.stdout.index("{")
    end = proc.stdout.rindex("}") + 1
    result = json.loads(proc.stdout[start:end])
    with open(dump) as fh:
        current = json.load(fh)
    return result, current


def test_no_plan_changes_outside_window(subprocess_check):
    result, _ = subprocess_check
    assert result["violations"] == [], (
        "queries changed plans while OUTSIDE the driver correctness "
        "window — add them to _DRIVER_PRIORITY's current round block and "
        f"re-pin (tools/plan_pins.py --pin): {result['violations']}"
    )


def test_window_is_exactly_fifty():
    assert len(driver_window()) == 50


def test_window_matches_priority_list_head():
    """ADVICE r9: the bare length check was vacuous — driver_window()
    returns the first 50 of a ~195-entry registry regardless of what
    _DRIVER_PRIORITY contains, so a typo'd window entry silently slid a
    different query into the checked window. Pin the contract: every
    priority name resolves to a registered query, and the registry's
    first 50 are exactly the first 50 DISTINCT valid priority entries
    in order (later round blocks may repeat names — first wins)."""
    from codegraphdb_spark import registry
    from codegraphdb_spark.registry import _DRIVER_PRIORITY

    registry.load_all()
    unknown = [n for n in _DRIVER_PRIORITY if n not in registry.QUERIES]
    assert unknown == [], f"_DRIVER_PRIORITY names not in the registry: {unknown}"
    seen: list[str] = []
    for n in _DRIVER_PRIORITY:
        if n not in seen:
            seen.append(n)
    assert driver_window() == seen[:50]


def test_gate_math_flags_tampered_pin(pins, subprocess_check):
    """The violation logic itself: flip one out-of-window pin and the
    check must flag exactly that query (the 8293a67 shape — a real plan
    change outside the window is indistinguishable from this)."""
    _, current = subprocess_check
    window = set(driver_window(pins.get("window_size", 50)))
    outside = next(n for n in pins["fingerprints"] if n not in window)
    tampered = {
        **pins,
        "fingerprints": {**pins["fingerprints"], outside: "0" * 32},
    }
    res = check(None, tampered, current=current)
    assert outside in res["violations"]


# NOTE: pin/check protocol — run `python tools/plan_pins.py --pin` in a
# QUIET environment (no concurrent sessions sharing spark-warehouse),
# immediately after editing _DRIVER_PRIORITY for a new round.
