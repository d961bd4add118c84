"""Bucketed-table layout: co-bucketed joins must be shuffle-free (the
physical plan carries no Exchange), and results must match the plain
shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.operators.bucketing import bucketed_join, write_bucketed
from codegraphdb_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    """With broadcast off (the 100 TB fact-fact condition — neither side
    fits in memory), the co-bucketed sort-merge join needs no Exchange and
    no Sort: bucket files are read pre-hashed and pre-sorted."""
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_ord = spark.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # one file per bucket (write_bucketed repartitions to guarantee it) +
    # this flag → the scan reports sorted output and the Sort is elided
    # (bucketed-scan ordering is opt-in since SPARK-28595)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        joined = bucketed_join(spark, lt, rt, ["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", prev_ord)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # bucket-sorted on the join key → no per-task Sort either
    assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    got = (
        bucketed_join(spark, lt, rt, ["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderkey")
        .limit(50)
        .collect()
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    expected = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderkey")
        .limit(50)
        .collect()
    )
    assert [(r["o_orderkey"], r["n"]) for r in got] == [
        (r["o_orderkey"], r["n"]) for r in expected
    ]
