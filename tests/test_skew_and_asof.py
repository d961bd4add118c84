"""Tests for skew utilities and the as-of join operator."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from codegraphdb_spark.operators.asof import asof_join
from codegraphdb_spark.operators.skew import salted_aggregate, salted_broadcast_left


def test_salted_aggregate_matches_plain(spark, sf_dir):
    from codegraphdb_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r["l_returnflag"],): (r["n"], round(r["s"], 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], round(r["s"], 2))
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            {"n": F.count(F.lit(1)), "s": F.sum("l_quantity")},
            {"n": F.sum("n"), "s": F.sum("s")},
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_plan_has_two_phases(spark, sf_dir):
    from codegraphdb_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    df = salted_aggregate(
        li, ["l_returnflag"], {"n": F.count(F.lit(1))}, {"n": F.sum("n")}
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # 2 logical phases x partial/final


def test_salted_broadcast_left_plan(spark, sf_dir):
    from codegraphdb_spark.sources.tables import load_table

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    df = salted_broadcast_left(c, n.withColumnRenamed("n_nationkey", "c_nationkey"), "c_nationkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 100, _ts("2024-01-01 10:00:00")),  # after r1
            (2, 100, _ts("2024-01-01 12:00:00")),  # after r2 (exact ts)
            (3, 100, _ts("2024-01-01 09:00:00")),  # before any right row
            (4, 200, _ts("2024-01-01 10:30:00")),  # other key
        ],
        "id BIGINT, k BIGINT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (10, 100, _ts("2024-01-01 09:30:00")),
            (11, 100, _ts("2024-01-01 12:00:00")),
            (12, 200, _ts("2024-01-01 10:00:00")),
        ],
        "rid BIGINT, k BIGINT, ts TIMESTAMP",
    )
    out = {
        r["id"]: r["rid_asof"]
        for r in asof_join(left, right, key="k", ts="ts", payload_cols=["rid"]).collect()
    }
    assert out == {1: 10, 2: 11, 3: None, 4: 12}


def test_asof_join_duplicate_right_ts_deterministic(spark):
    """Two right rows at the identical (key, ts): the winner must be stable
    across partitionings (max payload struct wins under the ordered
    window)."""
    left = spark.createDataFrame(
        [(1, 100, _ts("2024-01-01 10:00:00"))], "id BIGINT, k BIGINT, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [
            (10, 100, _ts("2024-01-01 09:30:00")),
            (11, 100, _ts("2024-01-01 09:30:00")),  # same key+ts
        ],
        "rid BIGINT, k BIGINT, ts TIMESTAMP",
    )
    outs = set()
    for parts in (1, 8):
        out = asof_join(
            left.repartition(parts), right.repartition(parts),
            key="k", ts="ts", payload_cols=["rid"],
        ).collect()
        outs.add(out[0]["rid_asof"])
    assert outs == {11}  # deterministic: greatest payload struct
