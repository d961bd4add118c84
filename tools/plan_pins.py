"""Mechanical window-rotation enforcement (VERDICT r8 item 2).

r8's closing commit changed the execution plans of two queries AFTER the
driver window was pinned, so neither landed in that round's CORRECTNESS
record — the rotation policy's rule (1) was violated by the very commit
that closed the round, and only the judge's own re-check caught it. This
tool makes the rule mechanical:

* ``--pin`` — fingerprint the OPTIMIZED logical plan of every registered
  query at the pin fixture (normalized: expression ids, paths, and
  partition counts stripped) and commit them as PLAN_PINS.json, at the
  moment the round's ``_DRIVER_PRIORITY`` window is pinned.
* ``--check`` — recompute and fail if any query whose plan changed since
  the pin is NOT inside the driver window's first 50 entries. A plan
  change for a windowed query is fine (that is what the window is for);
  a plan change outside it means a commit touched behavior the driver
  will not independently verify this round.

``tests/test_rotation_window.py`` runs the check in pytest, so the gate
trips in the ordinary test run, not just at round close. Run ``--pin``
again immediately after editing ``_DRIVER_PRIORITY`` for a new round.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PIN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_PINS.json"
)
PIN_SF = "/root/testdata/sf0.001"
PIN_CPUS = 8  # the pytest session shape — pin and check must match

_NORMALIZERS = [
    (re.compile(r"#\d+"), "#"),  # expression ids differ per session
    (re.compile(r"file:[^\s,\)\]]+"), "file:<p>"),
    (re.compile(r"/[^\s,\)\]]*testdata[^\s,\)\]]*"), "<sf>"),
    (re.compile(r"/tmp/[^\s,\)\]]+"), "<tmp>"),
    (re.compile(r"splits=Some\(\d+\)"), "splits=<n>"),
    (re.compile(r"Repartition \d+"), "Repartition <n>"),
    (re.compile(r"Statistics\([^)]*\)"), "Statistics(<s>)"),
]


def normalize_plan(plan: str) -> str:
    for rx, rep in _NORMALIZERS:
        plan = rx.sub(rep, plan)
    return plan


def plan_fingerprint(spark, fn, sf_dir: str) -> str:
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    return hashlib.md5(normalize_plan(plan).encode()).hexdigest()


def compute_all(spark, sf_dir: str = PIN_SF) -> dict[str, str]:
    from codegraphdb_spark import registry

    registry.load_all()
    out: dict[str, str] = {}
    for name, fn in registry.QUERIES.items():
        try:
            out[name] = plan_fingerprint(spark, fn, sf_dir)
        except Exception as e:  # noqa: BLE001 — a broken query is its own bug
            out[name] = f"ERROR:{type(e).__name__}"
    return out


def driver_window(n: int = 50) -> list[str]:
    from codegraphdb_spark import registry

    registry.load_all()
    return list(registry.QUERIES)[:n]


def check(spark, pins: dict | None = None, current: dict | None = None) -> dict:
    """{'changed_in_window': [...], 'violations': [...], 'new': [...]}.
    A violation is a query whose normalized plan differs from its pin but
    which is not in the driver window's first 50. Queries added since the
    pin (no baseline) count as violations unless windowed — new queries
    MUST be in the window by rotation rule (1). Pass ``current`` to reuse
    already-computed fingerprints (the full compute is ~minutes)."""
    if pins is None:
        with open(PIN_PATH) as fh:
            pins = json.load(fh)
    pinned = pins["fingerprints"]
    if current is None:
        current = compute_all(spark, pins.get("sf_dir", PIN_SF))
    window = set(driver_window(pins.get("window_size", 50)))
    changed_in_window, violations, new = [], [], []
    for name, fp in current.items():
        if name not in pinned:
            new.append(name)
            if name not in window:
                violations.append(name)
        elif fp != pinned[name]:
            if name in window:
                changed_in_window.append(name)
            else:
                violations.append(name)
    return {
        "changed_in_window": sorted(changed_in_window),
        "violations": sorted(violations),
        "new": sorted(new),
    }


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pin", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--sf-dir", default=PIN_SF)
    ap.add_argument(
        "--dump-current",
        default=None,
        help="also write the freshly computed fingerprints to this path "
        "(lets a test session reuse them without recomputing in its own "
        "cache-warm context — fingerprints are only comparable when "
        "computed in a FRESH session in catalog order, like the pin)",
    )
    args = ap.parse_args()
    if not (args.pin or args.check):
        ap.error("give --pin or --check")

    from codegraphdb_spark.session import get_spark

    # Fingerprints must be a pure function of (code, pin fixture): the
    # standing-index tables persist under ./spark-warehouse, and a query
    # that finds its table already persisted plans a catalog READ where a
    # cold session plans the BUILD — the r10 inherited red was exactly
    # this (16 of the committed pins never matched their own commit in a
    # cold-warehouse run). Point every pin/check session at a fresh temp
    # warehouse so the standing state is always cold and identical.
    import tempfile

    os.environ["SPARK_GRAFT_WAREHOUSE"] = tempfile.mkdtemp(
        prefix="plan_pins_wh_"
    )
    spark = get_spark("plan-pins", cpus=PIN_CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    if args.pin:
        fps = compute_all(spark, args.sf_dir)
        errs = {k: v for k, v in fps.items() if v.startswith("ERROR:")}
        with open(PIN_PATH, "w") as fh:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "cpus": PIN_CPUS,
                    "window_size": 50,
                    "fingerprints": fps,
                },
                fh,
                indent=0,
                sort_keys=True,
            )
        print(f"pinned {len(fps)} plans -> {PIN_PATH}; errors: {errs or 'none'}")
        return

    with open(PIN_PATH) as fh:
        pins = json.load(fh)
    current = compute_all(spark, pins.get("sf_dir", PIN_SF))
    if args.dump_current:
        with open(args.dump_current, "w") as fh:
            json.dump(current, fh)
    res = check(spark, pins, current=current)
    print(json.dumps(res, indent=2))
    if res["violations"]:
        print(
            "ROTATION VIOLATION: plans changed outside the driver window — "
            "add these to _DRIVER_PRIORITY's current round block and re-pin."
        )
        sys.exit(1)
    print("rotation check OK")


if __name__ == "__main__":
    main()
