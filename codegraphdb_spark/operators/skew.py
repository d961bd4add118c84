"""Skew-mitigation utilities (SURVEY §2 scale notes; BASELINE north star:
"skewed keys → salting or AQE skew-join").

AQE's skew-join splitting handles most sort-merge-join skew automatically
(enabled in session.py). These helpers cover the cases AQE does not:

- ``salted_aggregate``: two-phase aggregation for HOT GROUPING KEYS. A
  single key with 10^9 rows lands on one reducer under plain groupBy;
  salting spreads the partial aggregation over N tasks, then the tiny
  second phase (one row per (key, salt)) merges. Works for any algebraic
  aggregate (sum/count/min/max — pass partial and merge expressions).
- ``salted_broadcast_left``: replicate-broadcast join for a skewed PROBE
  side against a small build side — broadcasting sidesteps the shuffle
  entirely, which is the canonical fix when the dimension fits.

Salting is visible in the plan: two hash aggregates with the salt column
in the first grouping — assert it in tests, measure it at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
    row_discriminator: Column | None = None,
    mix_partition_id: bool = False,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    partial_aggs: output_col -> aggregate expression over raw rows.
    merge_aggs:   output_col -> aggregate expression over partial rows
                  (referencing the partial output columns).

    Example (count + sum):
        salted_aggregate(df, ["k"],
            {"n": F.count(F.lit(1)), "s": F.sum("x")},
            {"n": F.sum("n"), "s": F.sum("s")})

    The DEFAULT salt is a pure CONTENT hash: it travels with the row, so
    it is stable under partial stage recomputation even when the upstream
    plan is nondeterministic (sample, nondeterministic UDF source, legacy
    round-robin) — a row that migrates input partitions on recompute
    keeps its phase-1 shuffle key. Mixing ``spark_partition_id()`` into
    the salt breaks exactly that guarantee (the r5 default did, enabling
    the SPARK-23207-class lost/double-counted rows this function exists
    to prevent — ADVICE r5).

    Known degeneration of the content-only default: fully-IDENTICAL rows
    of a hot key hash to ONE salt bucket, re-concentrating the skew
    (results stay correct; the mitigation does nothing for them). Two
    opt-in escapes, in preference order:

    * ``row_discriminator`` — any column stable under task re-execution
      that varies within duplicate groups, e.g. a monotonic id over a
      CHECKPOINTED input (a raw monotonically_increasing_id over a lazy
      nondeterministic plan does NOT qualify);
    * ``mix_partition_id=True`` — adds ``spark_partition_id()`` to the
      hash. PRECONDITION (caller-asserted, not checkable here): the
      input's partitioning is deterministic under recomputation — true
      for file scans and hash shuffles, FALSE after sample()/
      nondeterministic UDFs/legacy round-robin. Under that precondition
      duplicates spanning map partitions spread over
      ~min(n_input_partitions, n_salts) reducers.
    """
    # CONTENT-derived salt, not rand(): rand is only deterministic for a
    # fixed (partition, row order) — under partial stage recomputation
    # (fetch failure, speculation) re-executed map tasks can assign rows
    # different salts than the blocks already fetched, silently losing or
    # double-counting rows in phase 1 (the SPARK-23207 class of bug). A
    # row-content hash is stable no matter where the row lands.
    salt_inputs: list[Column] = [F.col(c) for c in df.columns]
    if row_discriminator is not None:
        salt_inputs.append(row_discriminator)
    elif mix_partition_id:
        salt_inputs.append(F.spark_partition_id())
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_inputs), F.lit(n_salts)).cast("int")
    )
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return phase1.groupBy(*key_cols).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )


def salted_broadcast_left(
    skewed: DataFrame, small: DataFrame, on: str, how: str = "inner"
) -> DataFrame:
    """Join a skewed fact side against a small dimension WITHOUT shuffling
    the fact side: broadcast the dimension. (The salt-and-replicate variant
    for two big sides is subsumed by AQE skew-join; when the build side
    fits in memory this is strictly better — zero shuffle.)"""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "cross"):
        # Spark silently DROPS the broadcast hint for right/full outer
        # joins (the broadcast side cannot be the preserved side) and
        # shuffles the fact table anyway — refuse loudly instead of
        # quietly breaking the function's zero-shuffle contract
        raise ValueError(
            f"salted_broadcast_left cannot keep its no-shuffle contract for how={how!r}"
        )
    return skewed.join(F.broadcast(small), on, how)
