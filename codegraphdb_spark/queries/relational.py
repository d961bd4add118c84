"""Relational operator catalog (SURVEY.md §2.G).

Every concrete query in the reference reduces to scan–filter–join–project
(its Cypher surface, graphDB.py:106-112, is delegated to Neo4j); this module
declares the engine's equivalent coverage as named, oracle-checked queries
over the driver fixtures. Each maps to a built-in Catalyst primitive — plans
are declarative so pushdown / pruning / join-reordering are automatic.

Scale notes are inline per query; the common ones:
- nation/region are broadcast explicitly (fixed-size dims at any SF);
- aggregates pre-shuffle partially (Spark's hash agg does map-side combine);
- top-k uses ``orderBy().limit()`` which Spark executes as TakeOrdered —
  no global sort materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from codegraphdb_spark.queries._determinism import davg, dsum, sql_davg, sql_dsum
from codegraphdb_spark.registry import query
from codegraphdb_spark.sources.tables import load_table


# --- scan / filter / project -------------------------------------------------

@query(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           CAST(l_extendedprice * (1 - l_discount) AS DOUBLE) AS net_price
    FROM lineitem
    WHERE l_returnflag = 'R'
      AND l_quantity BETWEEN 10 AND 30
      AND l_shipdate >= TIMESTAMP '1997-01-01'
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + predicate pushdown + column pruning (SURVEY §2.G row 1).

    ``explain`` shows PushedFilters on l_returnflag/l_quantity/l_shipdate and
    a 6-column ReadSchema — the scan never reads the other 5 columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_returnflag") == "R")
            & F.col("l_quantity").between(10, 30)
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("double")
            .alias("net_price"),
        )
    )


@query(
    "point_lookup",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey = 42
    """,
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by key (reference `_match_node` graphDB.py:65-70).

    On a partitioned/sorted layout this is a single-file, single-row-group
    read via min/max pruning; pushdown makes it cheap even unpartitioned.
    """
    return load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") == 42)


@query(
    "filter_prefix_isin",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority LIKE '1%' AND o_orderstatus IN ('F', 'P')
    """,
)
def filter_prefix_isin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-prefix + isin predicates (reference B7/B8 change-list and
    path-prefix filters, update_version.py:36-42, graphDB.py:155-174)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").startswith("1") & F.col("o_orderstatus").isin("F", "P")
    ).select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus")


# --- aggregation --------------------------------------------------------------

@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical scan→filter→hash-agg.

    Grouping keys are tiny-cardinality (RF×LS ≈ 4) so the shuffle moves only
    partial aggregates — map-side combine does nearly all the work; this
    plan is flat-cost in partition count and safe at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_stats_by_segment",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
           {sql_davg('c_acctbal')} AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def agg_stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate incl. COUNT DISTINCT (expands to a two-phase
    partial/final agg under Catalyst; distinct is per-group hash-expanded)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            davg("c_acctbal").alias("avg_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "percentiles_by_segment",
    oracle="""
    SELECT c_mktsegment,
           CAST(quantile_cont(c_acctbal, 0.5) AS DOUBLE) AS median_bal,
           CAST(quantile_cont(c_acctbal, 0.9) AS DOUBLE) AS p90_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``: both sort and linearly interpolate, so the
    doubles are bit-identical). At 100 TB swap for
    ``percentile_approx`` (t-digest) — kept exact here because the oracle
    must match."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.expr("percentile(c_acctbal, 0.5)").alias("median_bal"),
            F.expr("percentile(c_acctbal, 0.9)").alias("p90_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "moments_exact",
    oracle="""
    WITH s AS (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))
                      * CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sxx
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           CAST(sx / n AS DOUBLE) AS mean_price,
           CAST(ROUND((sxx - sx * sx / n) / (n - 1)) AS BIGINT) AS var_price_int
    FROM s ORDER BY o_orderstatus
    """,
)
def moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance via exact decimal moment sums (Σx, Σx²) — the
    order-independent formulation; built-in ``var_samp`` streams doubles
    and is not cross-engine reproducible. Same single-shuffle plan.

    The variance is emitted as a rounded integer: the exact moment sums
    exceed 2^53, and decimal→double conversion of such values differs
    between engines at the last ulp — integer-rounding the ~2e10 variance
    absorbs that."""
    o = load_table(spark, sf_dir, "orders")
    # (25,4)×(12,4) → (38,8): inside precision 38 on both engines (no
    # scale truncation), and the wide operand forces DuckDB onto int128
    # physical storage (pure (12,4)×(12,4) overflows its int64 kernel)
    dec = F.col("o_totalprice").cast("decimal(12,4)")
    dec_wide = F.col("o_totalprice").cast("decimal(25,4)")
    s = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec_wide * dec).cast("double").alias("sxx"),
    )
    return s.select(
        "o_orderstatus",
        "n",
        (F.col("sx") / F.col("n")).cast("double").alias("mean_price"),
        F.round(
            (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)
        )
        .cast("bigint")
        .alias("var_price_int"),
    ).orderBy("o_orderstatus")


@query(
    "pivot_status_by_segment",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) FILTER (WHERE o.o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(COUNT(*) FILTER (WHERE o.o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(COUNT(*) FILTER (WHERE o.o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation): order counts per status column
    per segment, via ``pivot`` with an EXPLICIT value list — never the
    two-pass distinct-discovery pivot at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce("F", F.lit(0)).cast("bigint").alias("n_f"),
            F.coalesce("O", F.lit(0)).cast("bigint").alias("n_o"),
            F.coalesce("P", F.lit(0)).cast("bigint").alias("n_p"),
        )
        .orderBy("c_mktsegment")
    )


# KMV (k-minimum-values) cardinality sketch — the cross-engine-EXACT
# companion to approx_distinct_orders: both engines hash keys with md5,
# keep the k smallest distinct 60-bit hash prefixes, and estimate
# (k-1)·2^60 / h_k in exact integer arithmetic, so unlike HLL the sketch
# is oracle-checkable bit-for-bit. Scale shape: map-side partial dedup in
# the scan stage, so the one exchange carries 8-byte DISTINCT hashes —
# ~1000× smaller than the scanned column — and TakeOrdered keeps only k
# per partition after the final dedup; all whole-stage codegen, no Python.
# (A bounded-heap mapInPandas pre-cut to k per partition would shrink the
# exchange further to partitions×k longs, at the cost of an Arrow pass
# over the column — not worth it below ~10^10 distinct keys.)
_KMV_K = 1024
_KMV_SCALE = 1 << 60  # 15 hex chars of md5 = 60-bit hash domain


def _kmv_hash(col: str):
    """The shared 60-bit KMV hash: first 15 hex chars of md5 of the key's
    string form — identical arithmetic in the DuckDB oracles."""
    return F.conv(
        F.substring(F.md5(F.col(col).cast("string").cast("binary")), 1, 15),
        16,
        10,
    ).cast("bigint")


def _kmv_est_expr(k: int):
    """The shared estimator: exact count below k, else (k−1)·2^60 div h_k
    in overflow-safe decimal — expects columns ``m`` and ``hk``."""
    return F.when(F.col("m") < k, F.col("m").cast("bigint")).otherwise(
        F.expr(
            f"CAST(CAST({k - 1} AS DECIMAL(38,0)) * CAST({_KMV_SCALE} AS"
            " DECIMAL(38,0)) div CAST(hk AS DECIMAL(38,0)) AS BIGINT)"
        )
    )


def _kmv_estimate(df: DataFrame, col: str, k: int = _KMV_K) -> DataFrame:
    """One-row (key_col, est_distinct) KMV estimate for ``df[col]``.
    Falls back to the exact distinct count when fewer than k distinct
    hashes exist (the estimator is undefined there — and exact is free)."""
    # NULL keys are excluded on BOTH engines: Spark sorts NULL first in
    # ASC, DuckDB last — an unfiltered NULL would silently displace h_k
    # on one engine only (COUNT DISTINCT ignores NULLs anyway)
    topk = (
        df.filter(F.col(col).isNotNull())
        .select(_kmv_hash(col).alias("h"))
        .dropDuplicates(["h"])
        .orderBy("h")
        .limit(k)
    )
    return topk.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("m")).select(
        F.lit(col).alias("key_col"), _kmv_est_expr(k).alias("est_distinct")
    )


def _kmv_oracle_branch(col: str, k: int = _KMV_K) -> str:
    return f"""
      SELECT '{col}' AS key_col,
             CASE WHEN m < {k} THEN m
                  ELSE CAST({k - 1}::HUGEINT * {_KMV_SCALE}::HUGEINT // hk
                            AS BIGINT) END AS est_distinct
      FROM (SELECT MAX(h) AS hk, COUNT(*) AS m FROM (
              SELECT h FROM (
                SELECT DISTINCT CAST('0x' ||
                    substr(md5(CAST({col} AS VARCHAR)), 1, 15) AS BIGINT) AS h
                FROM lineitem WHERE {col} IS NOT NULL)
              ORDER BY h LIMIT {k}))
    """


@query(
    "approx_distinct_kmv",
    oracle=f"""
    SELECT * FROM ({_kmv_oracle_branch("l_orderkey")}
                   UNION ALL {_kmv_oracle_branch("l_partkey")})
    ORDER BY key_col
    """,
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV cardinality sketch (Bar-Yossef et al.'s k-minimum-values): the
    oracle-checkable approximate-distinct. approx_count_distinct's HLL
    registers can never hash-match another engine; KMV's statistic (the
    k smallest md5-prefix values) and estimator ((k-1)·2^60 div h_k) are
    pure integer arithmetic both engines reproduce bit-for-bit. Error
    ~1/sqrt(k) ≈ 3% at k=1024; accuracy vs exact asserted in
    tests/test_relational.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        _kmv_estimate(li, "l_orderkey")
        .unionByName(_kmv_estimate(li, "l_partkey"))
        .orderBy("key_col")
    )


@query(
    "approx_distinct_kmv_by_flag",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT l_returnflag AS grp,
             CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM lineitem WHERE l_orderkey IS NOT NULL),
    r AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
          FROM h),
    a AS (SELECT grp, MAX(h) AS hk, COUNT(*) AS m
          FROM r WHERE rn <= {_KMV_K} GROUP BY grp)
    SELECT grp,
           CASE WHEN m < {_KMV_K} THEN m
                ELSE CAST({_KMV_K - 1}::HUGEINT * {_KMV_SCALE}::HUGEINT // hk
                          AS BIGINT) END AS est_distinct
    FROM a ORDER BY grp
    """,
)
def approx_distinct_kmv_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED KMV: distinct-order cardinality per return flag — the
    sketch as a per-group aggregate. Shape: map-side dedup of (group,
    hash) pairs, ONE shuffle of deduped 8-byte hashes, bounded per-group
    window keeps k minima, tiny final aggregate. The grouped exact
    COUNT(DISTINCT) would shuffle every raw row; this shuffles each
    distinct key once and sorts per group — with the same cross-engine
    bit-exact estimator as approx_distinct_kmv. Low-cardinality grouping
    keys are the intended use (per-source, per-language, per-day stats);
    a skewed group degrades to one sorter per group, which AQE splits."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    deduped = (
        li.filter(F.col("l_orderkey").isNotNull())
        .select(F.col("l_returnflag").alias("grp"), _kmv_hash("l_orderkey").alias("h"))
        .dropDuplicates(["grp", "h"])
    )
    w = Window.partitionBy("grp").orderBy("h")
    topk = deduped.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= _KMV_K
    )
    return (
        topk.groupBy("grp")
        .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("m"))
        .select("grp", _kmv_est_expr(_KMV_K).alias("est_distinct"))
        .orderBy("grp")
    )


@query(
    "approx_distinct_orders",
    oracle="""
    SELECT 'l_orderkey' AS key_col,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,
           TRUE AS rel_err_le_5pct
    FROM lineitem
    UNION ALL
    SELECT 'l_partkey',
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
           TRUE
    FROM lineitem
    ORDER BY key_col
    """,
)
def approx_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct — the scale guard for 100 TB cardinality stats
    (SURVEY §2.G last row). HLL++ sketch: constant memory per group, exact
    COUNT(DISTINCT) would shuffle every distinct value.

    CHECKABLE CONTRACT (VERDICT r6 item 7): the raw HLL register values
    can never hash-match another engine, so the emitted — and
    oracle-hashed — columns are the exact count and the sketch's accuracy
    CONTRACT, |approx − exact| / exact ≤ 0.05 (2.5σ at rsd=0.02; HLL is
    deterministic per input, so the flag is run-stable). The oracle emits
    literal TRUE: a sketch drifting past tolerance flips the flag and
    hash-fails the row. The exact count exists here only to judge the
    sketch; the production query at 100 TB is the sketch alone
    (approx_distinct_kmv is the oracle-exact sketch family)."""
    li = load_table(spark, sf_dir, "lineitem")

    # rsd=0.02: sketch update cost scales with register count (~1/rsd^2) —
    # 0.01 measured ~4x slower for a precision tier cardinality stats
    # never need. The HLL agg and the exact COUNT(DISTINCT) run as
    # SEPARATE single-row aggregations joined afterwards: mixing them in
    # one Aggregate triggers the distinct-rewrite Expand plan, whose
    # codegen enumerates the HLL's ~680-word buffer per projection —
    # measured ~3.5s of DRIVER plan-compile time per fresh plan (4.4s →
    # 1.0s total for this query at sf0.1; execution itself is ~0.1s).
    def one(key: str) -> DataFrame:
        a = li.agg(F.approx_count_distinct(key, rsd=0.02).alias("a"))
        e = li.select(key).distinct().agg(F.count(key).alias("e"))
        return a.crossJoin(e).select(
            F.lit(key).alias("key_col"),
            F.col("e").cast("bigint").alias("exact_distinct"),
            (
                F.abs(F.col("a") - F.col("e")) / F.col("e") <= F.lit(0.05)
            ).alias("rel_err_le_5pct"),
        )

    return one("l_orderkey").unionAll(one("l_partkey")).orderBy("key_col")


# --- joins --------------------------------------------------------------------

@query(
    "revenue_by_nation",
    oracle=f"""
    SELECT n.n_name AS nation, r.r_name AS region,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n.n_name, r.r_name
    ORDER BY revenue DESC, nation
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (SURVEY §7.1): 5-way join + agg + sort — the spine of every
    reference query shape (C3–C5 expansions are exactly these equi-joins).

    Join strategy at scale: lineitem⋈orders is the one real shuffle (both
    sides huge, co-partitioned on the join key after shuffle); customer
    joins on the already-shuffled order side; nation/region are explicitly
    broadcast (constant-size dims). Revenue agg is decimal-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )


@query(
    "broadcast_dim_join",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_dsum('c.c_acctbal')} AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join against a fixed-size dimension — zero shuffle on
    the fact side (the C3 module-side-small case, ast_manage.py:24-35)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("nation")
    )


@query(
    "left_outer_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def left_outer_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving zero-order customers (reference C3
    miss-handling branch, ast_manage.py:162-167)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


@query(
    "semi_join_active_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (reference B5 cascade / B7 change-list membership).
    Semi joins ship only the join key of the probe side — no payload
    duplication, no fan-out on multi-match."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "anti_join_dormant_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-06-01')
    ORDER BY c_custkey
    """,
)
def anti_join_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (reference B4 missing-endpoint synthesis: keys present
    in edges but absent from nodes, graphDB.py:133-153). Dormant = no
    order since mid-2000: every fixture SF has a non-empty answer (27 at
    sf0.001), so the check cannot pass vacuously — the plain no-orders-ever
    predicate matched zero customers at the small SFs and would have let a
    broken anti-join slip through. The date filter is pushed below the
    anti-join to the orders scan."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_part_supplier_lineitem",
    oracle=f"""
    SELECT p.p_brand AS brand, s.s_name AS supplier_name,
           {sql_dsum('l.l_quantity')} AS total_qty
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE p.p_size >= 20
    GROUP BY p.p_brand, s.s_name
    ORDER BY brand, supplier_name
    """,
)
def join_part_supplier_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dim star join with a pushed filter on the dimension; Catalyst
    prunes part rows before the join (dim filter → smaller build side, AQE
    converts to broadcast when it fits)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    s = load_table(spark, sf_dir, "supplier")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("s_name").alias("supplier_name"))
        .agg(dsum("l_quantity").alias("total_qty"))
        .orderBy("brand", "supplier_name")
    )


# --- set operations / dedupe ---------------------------------------------------

@query(
    "set_except_all",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY c_custkey
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exceptAll — multiset difference (reference B4 endpoint synthesis uses
    exactly nodes-minus-edge-endpoints set algebra)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    left = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    right = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return left.exceptAll(right).orderBy("c_custkey")


@query(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'MACHINERY'
    ORDER BY k
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersectAll — multiset intersection (completes the set-op family
    with union/exceptAll; same hash-partition-both-sides plan)."""
    c = load_table(spark, sf_dir, "customer")
    left = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("k")
    )
    right = c.filter(F.col("c_mktsegment") == "MACHINERY").select(
        F.col("c_nationkey").alias("k")
    )
    return left.intersectAll(right).orderBy("k")


@query(
    "set_union_distinct",
    oracle="""
    SELECT DISTINCT k FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    ) ORDER BY k
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName + distinct (reference B1 merge unions new facts into the
    node set before window-dedupe)."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionByName(s).distinct().orderBy("k")


@query(
    "dedupe_drop_duplicates",
    oracle="""
    SELECT DISTINCT c_nationkey, c_mktsegment
    FROM customer
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def dedupe_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates on a key subset (reference E5 processed_relations set,
    ast_manage.py:21-23)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select("c_nationkey", "c_mktsegment")
        .dropDuplicates(["c_nationkey", "c_mktsegment"])
        .orderBy("c_nationkey", "c_mktsegment")
    )


# --- windows -------------------------------------------------------------------

@query(
    "window_last_wins_merge",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           o_orderdate AS latest_orderdate, o_totalprice AS latest_totalprice
    FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def window_last_wins_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window last-wins dedupe — THE merge primitive replacing the
    reference's read-modify-write node upsert (B1, graphDB.py:121-131):
    partition by key, order by recency desc, keep row 1. Set-oriented, no
    lock, deterministic under any partitioning (tie broken by unique key)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.col("o_totalprice").alias("latest_totalprice"),
        )
        .orderBy("o_custkey")
    )


@query(
    "window_rank_lag_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(RANK() OVER w_price AS BIGINT)  AS price_rank,
           LAG(o_orderkey) OVER w_time           AS prev_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w_price AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
           w_time  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_rank_lag_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: rank / lag / running sum (SURVEY §2.G ranking row).
    Running sum is decimal-exact so the cumulative double is identical on
    both engines at every row."""
    o = load_table(spark, sf_dir, "orders")
    w_price = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w_price).cast("bigint").alias("price_rank"),
            F.lag("o_orderkey").over(w_time).alias("prev_orderkey"),
            F.sum(F.col("o_totalprice").cast("decimal(30,4)")).over(w_run)
            .cast("double")
            .alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# --- sort / limit ---------------------------------------------------------------

@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: orderBy+limit compiles to TakeOrderedAndProject — per-partition
    heaps + driver merge, never a full sort shuffle. The only safe global
    top-k at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- scalar functions ------------------------------------------------------------

@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_key,
           REPLACE(c_name, '#', '-') AS name_dashed,
           CAST(LENGTH(c_name) AS INT) AS name_len
    FROM customer
    ORDER BY c_custkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string kernel (reference D-group: path strip D9, display join
    D7, composite keys D10 are all concat/substr/replace shapes)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.concat(
                F.col("c_mktsegment"), F.lit(":"), F.col("c_nationkey").cast("string")
            ).alias("seg_key"),
            F.regexp_replace("c_name", "#", "-").alias("name_dashed"),
            F.length("c_name").cast("int").alias("name_len"),
        )
        .orderBy("c_custkey")
    )


@query(
    "date_parts_orders",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def date_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp part extraction + group (calendar rollup shape)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("order_year", "order_month")
    )


@query(
    "case_when_bucketing",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS price_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_davg('o_totalprice')} AS avg_price
    FROM orders
    GROUP BY 1
    ORDER BY price_band
    """,
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + agg (reference label-promotion conditional B3,
    graphDB.py:82-92, is exactly a when/otherwise column rewrite)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.when(F.col("o_totalprice") < 50000, "small")
            .when(F.col("o_totalprice") < 150000, "medium")
            .otherwise("large")
            .alias("price_band")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            davg("o_totalprice").alias("avg_price"),
        )
        .orderBy("price_band")
    )


@query(
    "grouped_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           STRING_AGG(n_name, '|' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def grouped_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list with deterministic ordering via sort_array (reference C4
    result sets: children-of-module lists, ast_manage.py:37-50). The sorted
    list is emitted as a '|'-joined string: array cells are unhashable in
    pandas-based canonicalizers (the round-1 driver red was exactly that),
    and a delimited string carries identical information for value-hashing.
    """
    n = load_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("n_name")), "|").alias(
                "nations"
            )
        )
        .orderBy("n_regionkey")
    )


@query(
    "fuzzy_name_pairs",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INT) AS edit_dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 4
    ORDER BY edit_dist, name_a, name_b
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching via edit distance (entity-resolution shape).
    The dimension is tiny so the pair product is fine here; at scale you
    block first (prefix/phonetic/LSH buckets) and run levenshtein only
    inside blocks — same blocked-pair shape as emb_near_dup_pairs."""
    n = load_table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    dist = F.levenshtein(F.col("a.n_name"), F.col("b.n_name"))
    return (
        a.join(b, F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            dist.cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 4)
        .orderBy("edit_dist", "name_a", "name_b")
    )


@query(
    "regex_group_extract",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '#(\\d+)', 1) AS id_str,
           CAST(regexp_extract(c_name, '#(\\d+)', 1) AS BIGINT) AS id_num
    FROM customer
    WHERE regexp_extract(c_name, '#(\\d+)', 1) <> ''
    ORDER BY c_custkey
    """,
)
def regex_group_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture-group extraction (reference D3's <CODE> decode and D4's
    path parsing are the same regexp_extract shape). Stays in codegen."""
    c = load_table(spark, sf_dir, "customer")
    grp = F.regexp_extract("c_name", r"#(\d+)", 1)
    return (
        c.select(
            "c_custkey",
            grp.alias("id_str"),
            grp.cast("bigint").alias("id_num"),
        )
        .filter(F.col("id_str") != "")
        .orderBy("c_custkey")
    )


@query(
    "rolling_7d_customer_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(o_orderdate AS DATE) AS order_day,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_7d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER w AS DOUBLE)
             AS revenue_7d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
)
def rolling_7d_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day revenue per customer: a RANGE-frame window over event
    time (frame = value interval, not row count — peers with equal days
    aggregate identically regardless of physical order). One shuffle on
    o_custkey; the frame is computed in a single pass over each sorted
    partition. Decimal-exact window sum keeps doubles bit-identical."""
    o = load_table(spark, sf_dir, "orders")
    # frame over microsecond event time, exactly the oracle's
    # RANGE INTERVAL 6 DAY frame (a day-granular datediff frame would
    # diverge the moment a fixture carries non-midnight order timestamps).
    # timestampdiff is timezone-free on the NTZ column (unix_micros would
    # need an LTZ cast and inherit the session timezone)
    micros = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(micros)
        .rangeBetween(-6 * 86_400 * 1_000_000, Window.currentRow)
    )
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("order_day"),
            F.count(F.lit(1)).over(w).alias("n_orders_7d"),
            F.sum(F.col("o_totalprice").cast("decimal(30,4)"))
            .over(w)
            .cast("double")
            .alias("revenue_7d"),
        )
        .orderBy("o_orderkey")
    )


# --- grouping sets: rollup / cube -------------------------------------------

@query(
    "rollup_orders_report",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
             AS sum_totalprice
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def rollup_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (status → status+priority → grand total),
    TWO-PHASE: first aggregate to the finest grouping (a handful of rows
    at any corpus size — the keys are low-cardinality enums), then ROLLUP
    over the partial aggregates. The naive single-pass ROLLUP expands
    every input row ×(levels) before aggregating; pre-aggregating makes
    the Expand operate on ~15 rows instead of the fact table — the
    difference between O(N·levels) and O(N) shuffled bytes at 100 TB.
    Decimal partials re-aggregate exactly (sum of sums), so the result is
    bit-identical to the one-pass plan and to DuckDB. gid is the standard
    grouping bitmask (same bit order in Spark and DuckDB)."""
    o = load_table(spark, sf_dir, "orders")
    detail = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(30,4)")).alias("_sum"),
    )
    return (
        detail.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.sum("_n").alias("n_orders"),
            F.sum("_sum").cast("double").alias("sum_totalprice"),
        )
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "cube_returns_report",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE)
             AS sum_price
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def cube_returns_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-tab with margins (CUBE = all 2^k grouping sets),
    TWO-PHASE like rollup_orders_report: the naive single-pass CUBE
    expands every fact row 2^k times before aggregating (measured 2.4 s at
    sf0.1 vs 1.2 s for the same-width plain aggregate); aggregating to the
    finest grouping first (~6 rows — returnflag × linestatus are enums)
    makes the Expand negligible at any scale. Decimal partials
    re-aggregate exactly, so the margins are bit-identical to the
    single-pass plan and to DuckDB."""
    li = load_table(spark, sf_dir, "lineitem")
    detail = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_quantity").cast("decimal(30,4)")).alias("_q"),
        F.sum(F.col("l_extendedprice").cast("decimal(30,4)")).alias("_p"),
    )
    return (
        detail.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.sum("_n").alias("n_items"),
            F.sum("_q").cast("double").alias("sum_qty"),
            F.sum("_p").cast("double").alias("sum_price"),
        )
        .orderBy(
            "gid",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# --- distribution window functions -------------------------------------------

@query(
    "window_distribution_ranks",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank,
           CAST(CUME_DIST() OVER w AS DOUBLE) AS cume,
           CAST(NTILE(10) OVER w AS INT) AS decile,
           FIRST_VALUE(c_custkey) OVER w AS poorest_in_segment,
           LAST_VALUE(c_custkey) OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS richest_in_segment
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_custkey
    """,
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics: percent_rank / cume_dist / ntile /
    first_value / last_value in one window pass (single shuffle on the
    partition key, one sort per partition serves every function). The
    unique (acctbal, custkey) ordering makes the rank-derived doubles a
    single int/int division — cross-engine exact."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.percent_rank().over(w).cast("double").alias("pct_rank"),
            F.cume_dist().over(w).cast("double").alias("cume"),
            F.ntile(10).over(w).cast("int").alias("decile"),
            F.first("c_custkey").over(w).alias("poorest_in_segment"),
            F.last("c_custkey").over(wall).alias("richest_in_segment"),
        )
        .orderBy("c_custkey")
    )


# --- decision-support subquery shapes -----------------------------------------
# The reference's retry branch (ast_manage.py:162-167) is an existence probe;
# these queries declare the full subquery family a warehouse user expects:
# EXISTS with a correlated non-equi condition, a correlated aggregate
# threshold, and a scalar subquery feeding a filter — each decorrelated into
# the join Catalyst would pick anyway, so the shapes survive 100 TB.

@query(
    "exists_late_shipment_orders",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def exists_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS decorrelated to a LEFT SEMI join
    whose condition mixes the equi key (orderkey) with a non-equi
    cross-table predicate (shipped >90 days after order date). The semi
    join keeps at most one probe row per order — no fan-out — and the
    date filter on orders is pushed to the scan. At 100 TB both sides
    shuffle on orderkey once; nothing else moves."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    late = filtered.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "subquery_small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey, {sql_davg('l_quantity')} AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_small,
           {sql_dsum('l_extendedprice')} AS revenue
    FROM lineitem
    JOIN pa USING (l_partkey)
    JOIN part ON p_partkey = l_partkey
    WHERE l_quantity < 0.5 * avg_qty
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def subquery_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate threshold (rows below half
    their part's average quantity), decorrelated into groupBy+join on the
    correlation key. The per-part average is computed ONCE as an exact
    decimal mean (davg — bit-identical double on both engines, so the
    `<` boundary cannot flip cross-engine); 0.5× is a power-of-two scale,
    exact in binary. At scale: one shuffle on l_partkey serves both the
    aggregate and the re-join (co-partitioned), and the part dim joins on
    the same key; AQE picks broadcast when the dim fits."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pa = li.groupBy("l_partkey").agg(davg("l_quantity").alias("avg_qty"))
    return (
        li.join(pa, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_small"),
            dsum("l_extendedprice").alias("revenue"),
        )
        .orderBy("p_brand")
    )


@query(
    "scalar_subquery_rich_inactive",
    oracle=f"""
    WITH avg_bal AS (
      SELECT {sql_davg('c_acctbal')} AS bal_threshold
      FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > bal_threshold
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def scalar_subquery_rich_inactive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global positive-balance average)
    gating a NOT EXISTS anti join (above-average customers with no
    finalized order). The scalar is a 1-row aggregate joined in via
    broadcast (the only sound use of a cross join); the threshold is a
    davg decimal mean so the `>` boundary is cross-engine exact. The
    anti join shuffles on custkey — orders is filtered (status pushed to
    the scan) and projects ONLY o_custkey into it, so at 100 TB the
    probe side is one slim integer column."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    threshold = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal").alias("bal_threshold"))
    )
    finalized = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("bal_threshold"))
        .join(finalized, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "grouping_sets_report",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
             AS sum_totalprice
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither a rollup prefix chain nor a full
    cube): per-status and per-priority marginals in one pass, two-phase
    like rollup_orders_report — pre-aggregate to the finest grouping
    (status × priority ≈ 15 rows at any SF), then Expand over the
    partials only. Decimal partials re-aggregate exactly; gid is the
    standard grouping bitmask (same bit order both engines)."""
    o = load_table(spark, sf_dir, "orders")
    detail = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(30,4)")).alias("_sum"),
    )
    return (
        detail.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.sum("_n").alias("n_orders"),
            F.sum("_sum").cast("double").alias("sum_totalprice"),
        )
        .orderBy(
            "gid",
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "promo_revenue_ratio",
    oracle=f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             AS promo_revenue,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue,
           CAST({sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
                / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS DOUBLE)
             AS promo_share
    FROM lineitem JOIN part ON p_partkey = l_partkey
    GROUP BY 1
    ORDER BY ship_month
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue share
    per ship month) — numerator and denominator are exact decimal sums
    computed in ONE aggregation pass (a CASE inside the sum, not a second
    scan or self-join); the share is a single exactly-rounded double
    division of two bit-identical doubles. The part join shuffles on
    partkey once; AQE broadcasts the dim when it fits."""
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    part = load_table(spark, sf_dir, "part")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_net = F.when(F.col("p_type") == "PROMO", net).otherwise(F.lit(0))
    out = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"))
        .agg(
            dsum(promo_net).alias("promo_revenue"),
            dsum(net).alias("total_revenue"),
        )
    )
    return out.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue"))
        .cast("double")
        .alias("promo_share"),
    ).orderBy("ship_month")


@query(
    "having_share_threshold",
    oracle=f"""
    WITH per_nation AS (
      SELECT n_name, {sql_dsum('s_acctbal')} AS nation_value
      FROM supplier JOIN nation ON n_nationkey = s_nationkey
      GROUP BY n_name),
    total AS (
      SELECT {sql_dsum('s_acctbal')} AS total_value FROM supplier)
    SELECT n_name, nation_value
    FROM per_nation, total
    WHERE nation_value > total_value * 0.0625
    ORDER BY n_name
    """,
)
def having_share_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a scalar subquery — nations whose
    supplier balance exceeds a fixed share (1/16) of the GLOBAL total.
    Both sides are exact decimal sums (bit-identical doubles), the
    threshold multiplier is a power of two (exact in binary), and the
    global scalar reaches the per-nation aggregate as a broadcast 1-row
    product. Same decorrelation family as scalar_subquery_rich_inactive,
    but gating an AGGREGATE, not a row filter."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_nation = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(dsum("s_acctbal").alias("nation_value"))
    )
    total = s.agg(dsum("s_acctbal").alias("total_value"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("nation_value") > F.col("total_value") * 0.0625)
        .select("n_name", "nation_value")
        .orderBy("n_name")
    )


@query(
    "exclusive_late_supplier",
    oracle="""
    WITH per_ls AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS was_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY l_orderkey, l_suppkey),
    per_order AS (
      SELECT l_orderkey,
             COUNT(*) AS n_suppliers,
             SUM(was_late) AS n_late
      FROM per_ls GROUP BY l_orderkey)
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_exclusive_late_orders
    FROM per_ls
    JOIN per_order USING (l_orderkey)
    JOIN supplier s ON s.s_suppkey = per_ls.l_suppkey
    WHERE per_order.n_suppliers > 1
      AND per_order.n_late = 1
      AND per_ls.was_late = 1
    GROUP BY s.s_name
    ORDER BY n_exclusive_late_orders DESC, s_name
    """,
)
def exclusive_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS + NOT-EXISTS correlated pair ("another
    supplier on the order" / "no OTHER supplier was late") decorrelated
    into two grouped aggregates — per-(order, supplier) lateness, then
    per-order supplier/late counts — and a filter, instead of two
    re-executed correlated probes. Both aggregates share the orderkey
    shuffle; the supplier dim joins at the end on the already-tiny
    result. The 60-day lateness predicate mixes columns of both tables,
    so it evaluates post-join (not pushable) — the join itself stays the
    single orderkey-keyed hash join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"), 1
    ).otherwise(0)
    per_ls = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("was_late"))
    )
    # r10: the per-order counts were a groupBy + join-back over per_ls —
    # the one subtree then executed TWICE (ReuseExchange cannot fire: the
    # aggregate's exchange sits above a partial HashAggregate while the
    # join's sits above the raw frame — the 7f4d867 span-family analysis).
    # As window aggregates over the same orderkey partitioning, per_ls
    # executes once and the counts ride the exchange the aggregate
    # already established. count/sum over a partition are exact — same
    # values, same rows.
    wo = Window.partitionBy("l_orderkey")
    return (
        per_ls.withColumn("n_suppliers", F.count(F.lit(1)).over(wo))
        .withColumn("n_late", F.sum("was_late").over(wo))
        .filter(
            (F.col("n_suppliers") > 1)
            & (F.col("n_late") == 1)
            & (F.col("was_late") == 1)
        )
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exclusive_late_orders"))
        .orderBy(F.col("n_exclusive_late_orders").desc(), "s_name")
    )


@query(
    "value_range_window",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(COUNT(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
                               RANGE BETWEEN 100 PRECEDING AND 100 FOLLOWING)
                AS BIGINT) AS n_peers_within_100
    FROM customer
    ORDER BY c_custkey
    """,
)
def value_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-based RANGE frame (not a time interval): for each customer,
    how many same-segment customers sit within ±100 of their balance —
    the density-neighborhood window §2.G's ROWS/interval frames didn't
    cover. The frame bound is an exact double offset (100 is binary-exact
    and the 2-dp balances compare identically on both engines). One
    shuffle on the segment key; the range frame is evaluated in the same
    sort pass — no self-join, which is what makes the neighborhood count
    O(n log n) instead of the O(n²) band join a naive formulation pays."""
    c = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal")
        .rangeBetween(-100, 100)
    )
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.count(F.lit(1)).over(w).cast("bigint").alias("n_peers_within_100"),
        )
        .orderBy("c_custkey")
    )


@query(
    "orders_monthly_growth",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             {sql_dsum('o_totalprice')} AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1)
    SELECT month, revenue, n_orders,
           LAG(revenue) OVER (ORDER BY month) AS prev_revenue,
           CAST(revenue - LAG(revenue) OVER (ORDER BY month) AS DOUBLE)
             AS revenue_delta
    FROM monthly
    ORDER BY month
    """,
)
def orders_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth report: the aggregate-then-window reporting
    staple. The LAG window runs over the ALREADY-AGGREGATED monthly table
    (dozens of rows at any corpus size), so the unpartitioned window —
    normally a scale red flag — is safe by construction; revenues are
    exact decimal sums, their difference one exactly-rounded double op."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            dsum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )
    w = Window.orderBy("month")
    return (
        monthly.select(
            "month",
            "revenue",
            "n_orders",
            F.lag("revenue").over(w).alias("prev_revenue"),
            (F.col("revenue") - F.lag("revenue").over(w))
            .cast("double")
            .alias("revenue_delta"),
        )
        .orderBy("month")
    )


@query(
    "customer_revenue_concentration",
    oracle=f"""
    WITH per_cust AS (
      SELECT o.o_custkey AS custkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(30,4))) AS rev_dec
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey
    ),
    total AS (SELECT SUM(rev_dec) AS tot FROM per_cust),
    top20 AS (
      SELECT custkey, rev_dec,
             row_number() OVER (ORDER BY rev_dec DESC, custkey) AS rnk
      FROM per_cust
      ORDER BY rev_dec DESC, custkey LIMIT 20
    )
    SELECT CAST(rnk AS INT) AS rnk, custkey,
           CAST(rev_dec AS DOUBLE) AS revenue,
           CAST(CAST(SUM(rev_dec) OVER (ORDER BY rnk
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                / CAST((SELECT tot FROM total) AS DOUBLE) AS DOUBLE)
               AS cum_share
    FROM top20
    ORDER BY rnk
    """,
)
def customer_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) curve: the top-20 customers by
    decimal-exact revenue with each rank's cumulative share of TOTAL
    revenue — the whale-analysis / data-skew diagnostic. 100 TB shape:
    the per-customer aggregate is the only corpus-scale stage; the top-k
    cut is TakeOrdered (never a global sort), the cumulative window runs
    over exactly k rows, and the denominator is one broadcast scalar —
    an unpartitioned window over all customers appears nowhere. Shares
    are a single IEEE division of two decimal-derived doubles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(30,4)")
        .alias("rev"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), F.col("o_custkey").alias("custkey")
    )
    per_cust = li.join(o, "l_orderkey").groupBy("custkey").agg(
        F.sum("rev").alias("rev_dec")
    )
    total = per_cust.agg(F.sum("rev_dec").alias("tot"))
    top20 = (
        per_cust.orderBy(F.col("rev_dec").desc(), "custkey")
        .limit(20)
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.orderBy(F.col("rev_dec").desc(), "custkey")
            ),
        )
    )
    cum = F.sum("rev_dec").over(
        Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        top20.crossJoin(F.broadcast(total))
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "custkey",
            F.col("rev_dec").cast("double").alias("revenue"),
            (cum.cast("double") / F.col("tot").cast("double")).alias("cum_share"),
        )
        .orderBy("rnk")
    )


@query(
    "orders_open_backlog",
    oracle="""
    WITH span AS (
      SELECT o.o_orderkey,
             CAST(date_trunc('month', o.o_orderdate) AS TIMESTAMP) AS sm,
             CAST(date_trunc('month',
                  coalesce(max(l.l_shipdate), o.o_orderdate)) AS TIMESTAMP) AS em
      FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
      SELECT sm AS month, 1 AS delta FROM span
      UNION ALL
      SELECT em + INTERVAL 1 MONTH, -1 FROM span
    ),
    monthly AS (SELECT month, SUM(delta) AS d FROM deltas GROUP BY month)
    SELECT month,
           CAST(SUM(d) OVER (ORDER BY month ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS open_orders
    FROM monthly ORDER BY month
    """,
)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent open orders per month by SWEEP LINE: each order's open
    interval (orderdate → last item shipdate) contributes +1 at its start
    month and −1 one month past its end month; a running sum over the
    aggregated month deltas counts intervals intersecting each month.
    This is the linear-cost temporal-overlap shape: the naive alternative
    joins orders × months (or self-joins intervals, quadratic); the sweep
    is one orderkey aggregate, one tiny month-keyed aggregate, and a
    running window over <100 rows — at 100 TB the only corpus-scale
    stage is the orders⋈lineitem max-shipdate aggregate the warehouse
    already co-partitions on orderkey."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # r10 (guide §2.3 "aggregate before you shuffle"): max(l_shipdate) is
    # per-orderkey, so aggregate lineitem BEFORE the join — the partial
    # (map-side) aggregate collapses ~4 lines/order before the exchange,
    # and the post-join re-aggregate disappears (o_orderkey is unique, so
    # join-then-max == max-then-join exactly, coalesce unchanged).
    last = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
    span = (
        o.join(last, o.o_orderkey == last.l_orderkey, "left")
        .select(
            F.date_trunc("month", "o_orderdate").alias("sm"),
            F.date_trunc(
                "month", F.coalesce("last_ship", "o_orderdate")
            ).alias("em"),
        )
    )
    deltas = span.select(F.col("sm").alias("month"), F.lit(1).alias("delta")).unionAll(
        span.select(
            (F.col("em") + F.expr("INTERVAL 1 MONTH")).alias("month"),
            F.lit(-1).alias("delta"),
        )
    )
    monthly = deltas.groupBy("month").agg(F.sum("delta").alias("d"))
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month", F.sum("d").over(w).cast("bigint").alias("open_orders")
    ).orderBy("month")
