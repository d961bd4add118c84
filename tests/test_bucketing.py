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


@pytest.fixture(scope="module")
def bucketed_snapshot(spark):
    """The mini-repo graph written as a bucketed snapshot: nodes
    partitioned by kind + bucketed by full_name, edges partitioned by
    rel_type + bucketed by src (plus a dst-bucketed copy)."""
    from codegraphdb_spark.engine import GraphEngine
    from codegraphdb_spark.queries.graph import _graph

    nodes, edges, _ = _graph(spark)
    eng = GraphEngine(spark)
    eng.write_snapshot_bucketed(
        nodes, edges, "b_snap", n_buckets=4, edges_by_dst=True
    )
    yield eng
    for t in ("b_snap_nodes", "b_snap_edges", "b_snap_edges_by_dst"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_snapshot_forward_expansion_no_exchange(spark, bucketed_snapshot, no_broadcast):
    """C3/C4 shape on the bucketed snapshot: parent nodes ⋈ edges ON
    full_name = src — both scans pre-hashed, ZERO Exchange (the join that
    shuffled the whole nodes table per query on the path-style snapshot)."""
    eng = bucketed_snapshot
    bn, be = eng.read_snapshot_bucketed("b_snap")
    q = bn.filter(F.col("kind") == "MODULE").join(
        be.filter(F.col("rel_type") == "CONTAINS"),
        bn.full_name == be.src,
    )
    plan = _plan(q)
    assert "Exchange" not in plan, plan
    assert q.count() > 0


def test_snapshot_reverse_expansion_no_exchange(spark, bucketed_snapshot, no_broadcast):
    """C5 reverse shape (who points at me) on the dst-bucketed edge copy:
    nodes ⋈ edges ON full_name = dst with zero Exchange."""
    eng = bucketed_snapshot
    bn, _ = eng.read_snapshot_bucketed("b_snap")
    _, bed = eng.read_snapshot_bucketed("b_snap", edges_by_dst=True)
    q = bn.filter(F.col("kind") == "METHOD").join(
        bed.filter(F.col("rel_type") == "HAS_METHOD"),
        bn.full_name == bed.dst,
    )
    plan = _plan(q)
    assert "Exchange" not in plan, plan
    assert q.count() > 0


def test_snapshot_pagerank_contribution_join_edge_side_free(
    spark, bucketed_snapshot, no_broadcast
):
    """The pagerank contribution join (links ⋈ ranks ON src = vertex,
    operators/analytics.py::pagerank_int) over bucketed edges: the edge
    side — the 100 TB side — contributes NO Exchange; the only shuffle
    left is the rank side's aggregation. The unbucketed twin shuffles
    both."""
    eng = bucketed_snapshot
    bn, be = eng.read_snapshot_bucketed("b_snap")
    pairs = be.select("src", "dst").dropDuplicates()
    outdeg = pairs.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    links = pairs.join(outdeg, "src")
    ranks = bn.select(F.col("full_name").alias("vertex")).withColumn(
        "rank", F.lit(1).cast("bigint")
    )
    contrib = links.join(ranks, links.src == ranks.vertex)
    n_bucketed = _plan(contrib).count("Exchange")
    # dropDuplicates + groupBy + join all key on src: the bucketed scan's
    # partitioning satisfies every one of them
    assert n_bucketed <= 1, _plan(contrib)

    # unbucketed twin: same frames from a plain parquet-path snapshot
    from codegraphdb_spark.queries.graph import _graph

    nodes, edges, _ = _graph(spark)
    p2 = edges.select("src", "dst").dropDuplicates()
    o2 = p2.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    l2 = p2.join(o2, "src")
    r2 = nodes.select(F.col("full_name").alias("vertex")).withColumn(
        "rank", F.lit(1).cast("bigint")
    )
    n_plain = _plan(l2.join(r2, l2.src == r2.vertex)).count("Exchange")
    assert n_bucketed < n_plain, (n_bucketed, n_plain)


def test_bucketed_snapshot_roundtrip_equals_source(spark, bucketed_snapshot):
    """Read-back content equals the in-memory snapshot (partition columns
    move position in managed tables — compare on aligned columns)."""
    from codegraphdb_spark.queries.graph import _graph

    eng = bucketed_snapshot
    nodes, edges, _ = _graph(spark)
    bn, be = eng.read_snapshot_bucketed("b_snap")
    cols_n = sorted(nodes.columns)
    cols_e = sorted(edges.columns)
    assert sorted(bn.columns) == cols_n
    assert sorted(be.columns) == cols_e
    assert bn.select(cols_n).exceptAll(nodes.select(cols_n)).isEmpty()
    assert nodes.select(cols_n).exceptAll(bn.select(cols_n)).isEmpty()
    assert be.select(cols_e).exceptAll(edges.select(cols_e)).isEmpty()
    assert edges.select(cols_e).exceptAll(be.select(cols_e)).isEmpty()
