"""Size-gated broadcast hints (ADVICE r8): an unconditional F.broadcast
on an O(corpus) frame fails at exactly the scale the engine claims, so
every deliberate broadcast of a corpus-shaped frame must be gated on
what is known about its size."""

from __future__ import annotations

from pyspark.sql import functions as F

from codegraphdb_spark.operators.hints import (
    broadcast_if_rows,
    broadcast_if_small,
    plan_size_bytes,
)


def _n_broadcast_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "BroadcastExchange"
    )


def test_small_frame_broadcasts_and_capped_frame_does_not(spark, tmp_path):
    path = str(tmp_path / "dim.parquet")
    spark.range(100).selectExpr("id AS k", "id * 2 AS v").write.parquet(path)
    dim = spark.read.parquet(path)
    fact = spark.range(10_000).selectExpr("id % 100 AS k", "id AS x")

    est = plan_size_bytes(dim)
    assert 0 < est < 1024 * 1024, "leaf-scan estimate should be file bytes"

    hinted = fact.join(broadcast_if_small(dim), "k")
    assert _n_broadcast_exchanges(hinted) >= 1

    # with a 1-byte cap the same frame must NOT be hinted: the join may
    # still broadcast if the planner independently chooses to (tiny
    # inputs), so assert on the analyzed plan's hint (the optimizer
    # strips hints that end up outside a join), not the join
    refused = broadcast_if_small(dim, cap_bytes=1)
    assert "ResolvedHint" not in refused._jdf.queryExecution().analyzed().toString()
    assert (
        "ResolvedHint"
        in F.broadcast(dim)._jdf.queryExecution().analyzed().toString()
    )


def test_row_gate(spark):
    df = spark.range(10).selectExpr("id AS k")
    opt = lambda d: d._jdf.queryExecution().analyzed().toString()  # noqa: E731
    assert "ResolvedHint" in opt(broadcast_if_rows(df, 10, cap_rows=100))
    assert "ResolvedHint" not in opt(broadcast_if_rows(df, 101, cap_rows=100))
