"""Duplicate-heavy hot-key skew stress (VERDICT r4 item 3 'done' gate).

1M rows, ONE key holding 50% of them as EXACT duplicate rows — the skew
shape raw logs have, and exactly the shape a content-only salt cannot
spread (identical rows hash identically). Measures the per-reducer
(phase-1 bucket) row-count profile of salted_aggregate under

  * the DEFAULT content-only salt (recomputation-safe even over
    nondeterministic upstreams — ADVICE r5 made this the default again;
    on exact duplicates it is correct but degenerate, by contract), and
  * the OPT-IN ``mix_partition_id=True`` escape (valid here: the input is
    a deterministic checkpointed frame),

and asserts the opt-in max bucket is ≥8× smaller. Also cross-checks that
both profiles merge to the identical final aggregate (the algebraic
split-invariance contract).

Usage: python tools/stress_skew.py [n_rows] [n_parts]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from codegraphdb_spark.operators.skew import salted_aggregate  # noqa: E402
from codegraphdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_parts = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    spark = get_spark("stress-skew")
    spark.sparkContext.setLogLevel("ERROR")

    n_hot = n_rows // 2
    hot = (
        spark.range(n_hot)
        .repartition(n_parts)
        .select(F.lit("HOT").alias("k"), F.lit(1.0).alias("x"))
    )
    cold = spark.range(n_rows - n_hot).select(
        F.concat(F.lit("c"), (F.col("id") % 100_000)).alias("k"),
        F.lit(2.0).alias("x"),
    )
    df = hot.unionByName(cold).localCheckpoint(eager=True)

    def profile(tag, **kw):
        t0 = time.time()
        rows = salted_aggregate(
            df,
            ["k"],
            {"n": F.count(F.lit(1)), "s": F.sum(F.col("x").cast("bigint"))},
            {
                "total": F.sum("n"),
                "sum_x": F.sum("s"),
                "buckets": F.count(F.lit(1)),
                "max_bucket": F.max("n"),
            },
            **kw,
        ).collect()
        wall = time.time() - t0
        hotrow = next(r for r in rows if r["k"] == "HOT")
        total = {r["k"]: (r["total"], r["sum_x"]) for r in rows}
        return {
            "tag": tag,
            "wall_s": round(wall, 2),
            "hot_total": hotrow["total"],
            "hot_buckets": hotrow["buckets"],
            "hot_max_bucket": hotrow["max_bucket"],
        }, total

    old, merged_old = profile("default_content_only")
    new, merged_new = profile("optin_partition_mixed", mix_partition_id=True)

    assert old["hot_total"] == new["hot_total"] == n_hot
    assert merged_old == merged_new, "two-phase split changed the final aggregate"
    spread = old["hot_max_bucket"] / new["hot_max_bucket"]
    assert old["hot_buckets"] == 1, "content-only salt unexpectedly spread duplicates"
    # the degenerate default is the documented trade; the escape must work
    assert spread >= 8, f"spread only {spread:.1f}x (need >=8x)"
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "n_hot_duplicates": n_hot,
                "n_input_partitions": n_parts,
                "old": old,
                "new": new,
                "max_bucket_spread_x": round(spread, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
