"""Size-gated broadcast hints (ADVICE r8).

An unconditional ``F.broadcast(df)`` is a scale landmine: the hint
overrides ``spark.sql.autoBroadcastJoinThreshold`` entirely, so a frame
that is 1 MB at test scale but O(corpus) in production (e.g. one row per
distinct document set) gets collected to the driver and shipped to every
executor until it physically cannot be — the query then dies at exactly
the scale the engine claims to serve. The fix is to make the hint
conditional on what is actually known about the frame's size:

* ``broadcast_if_small`` — gate on Catalyst's own ``sizeInBytes``
  estimate. Reliable for LEAF scans (parquet file bytes), deliberately
  conservative for derived plans (Catalyst inflates unknown stats), so a
  derived frame simply falls through to sort-merge and AQE's runtime
  ``DynamicJoinSelection`` — which converts back to broadcast-hash if the
  materialized stage turns out small, at the cost of a local shuffle
  read rather than a failed collect.
* ``broadcast_if_rows`` — gate on a row count the CALLER measured (e.g.
  the count of an already-checkpointed candidate frame it reuses
  anyway). Exact where stats cannot be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default ceiling for a deliberate (hint-forced) broadcast. Far above the
# 10 MB auto threshold — a standing size/dim table in the hundreds of MB
# still beats re-shuffling a quadratic probe side on a 32-thread local
# run or a real cluster — but bounded, so an O(corpus) frame at
# production scale falls to SMJ + AQE instead of failing the collect.
DEFAULT_BROADCAST_CAP_BYTES = 256 * 1024 * 1024

# Row ceiling for caller-counted frames: ~50 B/row of narrow key columns
# keeps the materialized broadcast comfortably under the byte cap.
DEFAULT_BROADCAST_CAP_ROWS = 1_000_000


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate of the optimized plan — file bytes
    for leaf scans, propagated (over-)estimates for derived plans."""
    est = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    # py4j maps the scala BigInt to a Python int on some bridges and to a
    # JavaObject on others
    return est if isinstance(est, int) else int(est.toString())


def broadcast_if_small(
    df: DataFrame, cap_bytes: int = DEFAULT_BROADCAST_CAP_BYTES
) -> DataFrame:
    """``F.broadcast(df)`` iff Catalyst's size estimate is under
    ``cap_bytes``; otherwise the frame is returned unhinted and the
    planner/AQE choose the strategy."""
    try:
        est = plan_size_bytes(df)
    except Exception:  # noqa: BLE001 — no estimate == not provably small
        return df
    return F.broadcast(df) if est <= cap_bytes else df


def broadcast_if_rows(
    df: DataFrame,
    n_rows: int,
    cap_rows: int = DEFAULT_BROADCAST_CAP_ROWS,
) -> DataFrame:
    """``F.broadcast(df)`` iff the caller-measured ``n_rows`` is under
    ``cap_rows`` — for derived frames whose Catalyst stats are unusable
    but whose cardinality the caller already paid to know."""
    return F.broadcast(df) if n_rows <= cap_rows else df
