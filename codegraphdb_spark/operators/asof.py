"""As-of (most-recent-prior-event) join — a custom operator the reference
lacks and Spark has no built-in for (SURVEY §2 note: implement such
operators as compositions of existing DataFrame ops when semantics allow).

Semantics: for every LEFT row, attach the latest RIGHT row with the same
key whose timestamp is <= the left timestamp (DuckDB/kdb ASOF JOIN,
backward direction).

Implementation is the UNION + WINDOW pattern, NOT a range join:
  1. tag both sides and union on (key, ts);
  2. sort within key by (ts, side) — right rows sort before left rows at
     equal ts so an exact-ts match is visible to its left row;
  3. last_value(right payload, ignoreNulls) over rows-unbounded-preceding
     gives each left row the most recent right payload;
  4. keep left rows.

Why this scales: ONE shuffle on the key (same as any groupBy), state is a
running single value per partition stream — versus the naive
inequality-join which explodes to O(left × right-per-key) pairs. This is
also exactly the streaming-friendly formulation (the running last_value is
a tiny keyed state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: left rows + latest right payload at or before
    the left row's timestamp. Right-side payload columns are suffixed."""
    if not payload_cols:
        raise ValueError("payload_cols must be non-empty")
    l_cols = list(left.columns)
    # backtick-quote field names: unquoted DDL rejects spaces/hyphens/dots
    left_struct_type = (
        "struct<"
        + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in l_cols)
        + ">"
    )
    right_struct_type = (
        "struct<"
        + ",".join(
            f"`{c}`:{right.schema[c].dataType.simpleString()}" for c in payload_cols
        )
        + ">"
    )

    # NULL timestamps carry no ordering information: a NULL-ts right row
    # must never be "the latest prior event" (ascending nulls-first would
    # make it earlier than everything), and a NULL-ts left row has no
    # as-of point — both match DuckDB/kdb ASOF semantics (comparisons
    # with NULL are never true).
    null_left = left.filter(F.col(ts).isNull())
    left = left.filter(F.col(ts).isNotNull())
    right = right.filter(F.col(ts).isNotNull())

    union = left.select(
        F.col(key).alias("__key"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in l_cols]).alias("__left"),
        F.lit(None).cast(right_struct_type).alias("__rp"),
    ).unionByName(
        right.select(
            F.col(key).alias("__key"),
            F.col(ts).alias("__ts"),
            F.lit(0).alias("__side"),
            F.lit(None).cast(left_struct_type).alias("__left"),
            F.struct(*[F.col(c) for c in payload_cols]).alias("__rp"),
        )
    )

    # right rows (side 0) sort before left rows at equal ts, so an exact-ts
    # match is visible; the payload travels as ONE struct so all columns
    # come from the SAME right row. __rp as the final sort key makes the
    # winner among equal-(ts) right rows deterministic (struct comparison
    # is field-wise) instead of partition-order-dependent.
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__side", F.col("__rp"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = union.select(
        "__side",
        "__left",
        F.last("__rp", ignorenulls=True).over(w).alias("__rp"),
    )
    out = filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in l_cols],
        *[F.col(f"__rp.{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
    # NULL-ts left rows survive with a NULL payload (no as-of point)
    null_out = null_left.select(
        *[F.col(c) for c in l_cols],
        *[
            F.lit(None)
            .cast(right.schema[c].dataType)
            .alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    )
    return out.unionByName(null_out)
