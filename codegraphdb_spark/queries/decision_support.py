"""Decision-support catalog: the remaining classic TPC-H query shapes,
adapted to the fixture schema (no partsupp / commitdate / shipmode columns
— each docstring notes the stand-in). Together with relational.py's
Q1/Q4/Q5/Q6/Q11/Q14/Q17/Q21/Q22 shapes this completes the TPC-H family.

Why these matter for the engine (SURVEY §2.G): each is a *canonical plan
shape* — top-k over a 3-way join (Q3), direction-paired dim join (Q7),
share-of-total ratio (Q8), multi-fact profit delta (Q9), outer-join count
distribution (Q13), having-over-grouped-fact (Q18), disjunctive pushdown
(Q19), distinct-agg with anti-join (Q16), agg-equality scalar (Q15),
per-group argmax (Q2), conditional counts over a date-arithmetic join
(Q12), returned-revenue top-k (Q10). Correctness via DuckDB oracles;
determinism via decimal-exact sums (queries/_determinism.py).

Scale notes (100 TB): lineitem⋈orders is always the one genuine shuffle —
both sides hash-partition on the order key; every dimension side (part,
supplier, nation, region) is either broadcast or pre-filtered to broadcast
size by a pushed predicate. Top-k is orderBy().limit() → TakeOrdered (no
global sort). No correlated per-row subqueries survive compilation — every
correlation is decorrelated to a join the way Catalyst wants it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from codegraphdb_spark.queries._determinism import dsum, sql_dsum
from codegraphdb_spark.registry import query
from codegraphdb_spark.sources.tables import load_table


@query(
    "shipping_priority_topk",
    oracle=f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: unshipped revenue of BUILDING-segment orders,
    top 10. The mktsegment filter is pushed into the customer scan (1/5
    selectivity) so the customer side shrinks before the join; AQE turns
    it broadcast at low SF. orderBy+limit plans as TakeOrdered — at 100 TB
    each partition keeps its local top-10, no global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "region_volume_shipping",
    oracle=f"""
    SELECT rs.r_name AS supp_region, rc.r_name AS cust_region,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN region rs ON ns.n_regionkey = rs.r_regionkey
    JOIN region rc ON nc.n_regionkey = rc.r_regionkey
    WHERE ((rs.r_name = 'EUROPE' AND rc.r_name = 'ASIA')
        OR (rs.r_name = 'ASIA' AND rc.r_name = 'EUROPE'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                         AND TIMESTAMP '1997-12-31'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def region_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping, region-paired (the fixtures' 10–100 suppliers
    make single-nation pairs too sparse; regions keep the direction-pair
    semantics): EUROPE↔ASIA trade volume per direction per ship-year.
    nation/region are load-broadcast on BOTH sides (aliased twins);
    supplier is dim-sized and joins after the fact-fact shuffle. The OR of
    the two directions is evaluated post-join on broadcast columns — no
    blowup. Year comes from l_shipdate so the 2-year predicate prunes."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    )
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    ns = load_table(spark, sf_dir, "nation").alias("ns")
    nc = load_table(spark, sf_dir, "nation").alias("nc")
    rs = load_table(spark, sf_dir, "region").alias("rs")
    rc = load_table(spark, sf_dir, "region").alias("rc")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(ns, s.s_nationkey == F.col("ns.n_nationkey"))
        .join(nc, c.c_nationkey == F.col("nc.n_nationkey"))
        .join(rs, F.col("ns.n_regionkey") == F.col("rs.r_regionkey"))
        .join(rc, F.col("nc.n_regionkey") == F.col("rc.r_regionkey"))
        .filter(
            (
                (F.col("rs.r_name") == "EUROPE")
                & (F.col("rc.r_name") == "ASIA")
            )
            | (
                (F.col("rs.r_name") == "ASIA")
                & (F.col("rc.r_name") == "EUROPE")
            )
        )
    )
    return (
        joined.groupBy(
            F.col("rs.r_name").alias("supp_region"),
            F.col("rc.r_name").alias("cust_region"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            )
        )
        .orderBy("supp_region", "cust_region", "ship_year")
    )


@query(
    "market_share_by_year",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           {sql_dsum("CASE WHEN rs.r_name = 'ASIA' "
                     "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
             AS asia_volume,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_volume,
           CAST({sql_dsum("CASE WHEN rs.r_name = 'ASIA' "
                          "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
                / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS DOUBLE)
             AS asia_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN region rcu ON nc.n_regionkey = rcu.r_regionkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN region rs ON ns.n_regionkey = rs.r_regionkey
    WHERE rcu.r_name = 'EUROPE' AND p_type = 'PROMO'
    GROUP BY 1 ORDER BY 1
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 market share: among PROMO parts sold to EUROPE customers, the
    ASIA-supplier share of revenue per order-year. Share = conditional
    decimal sum / total decimal sum — both operands bit-identical across
    engines, the quotient one exactly-rounded IEEE division (the invariant
    ratios rely on). The CASE keeps it ONE aggregation pass — no second
    join or self-union for the numerator."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    nc = load_table(spark, sf_dir, "nation").alias("ncu")
    rcu = load_table(spark, sf_dir, "region").alias("rcu")
    ns = load_table(spark, sf_dir, "nation").alias("nsu")
    rs = load_table(spark, sf_dir, "region").alias("rsu")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    asia_vol = F.when(F.col("rsu.r_name") == "ASIA", vol).otherwise(F.lit(0.0))
    # r11 (guide §3.2 reduce the big side BEFORE shuffling it): the
    # selective PROMO-part broadcast join runs FIRST, so lineitem is cut
    # ~5x (and the supplier-region columns attached, map-side) before
    # orders and customer ever see it — at production scale, where
    # orders/customer no longer fit a broadcast, the one big
    # lineitem⋈orders shuffle then moves only surviving rows. The chain
    # stays LINEAR on purpose: grouping the two sides into subtrees was
    # measured to defeat the planner's per-table broadcast estimates at
    # bench scale (it planned a SortMergeJoin + 2 Exchanges for frames
    # that fit in memory). Inner-join reassociation only; identical rows
    # out (oracle-checked).
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(ns, s.s_nationkey == F.col("nsu.n_nationkey"))
        .join(rs, F.col("nsu.n_regionkey") == F.col("rsu.r_regionkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(nc, c.c_nationkey == F.col("ncu.n_nationkey"))
        .join(rcu, F.col("ncu.n_regionkey") == F.col("rcu.r_regionkey"))
        .filter(F.col("rcu.r_name") == "EUROPE")
    )
    return (
        joined.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            dsum(asia_vol).alias("asia_volume"),
            dsum(vol).alias("total_volume"),
        )
        .select(
            "order_year",
            "asia_volume",
            "total_volume",
            (F.col("asia_volume") / F.col("total_volume"))
            .cast("double")
            .alias("asia_share"),
        )
        .orderBy("order_year")
    )


@query(
    "product_type_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST({sql_dsum('l_extendedprice * (1 - l_discount)')}
                - {sql_dsum('p_retailprice * l_quantity')} AS DOUBLE)
             AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2 ORDER BY 1, 2 DESC
    """,
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit (no partsupp ⇒ p_retailprice·quantity is the
    cost stand-in): per supplier-nation per year over parts named
    '%widget%'. Both terms are exact decimal sums of 2-dp×small-int
    products; their difference is one double subtraction of bit-identical
    operands. The LIKE prunes part before the join; profit needs TWO fact
    expressions but still ONE aggregation pass (two decimal partials)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(
            (
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                - dsum(F.col("p_retailprice") * F.col("l_quantity"))
            )
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", F.desc("order_year"))
    )


@query(
    "returned_item_report",
    oracle=f"""
    SELECT c_custkey, c_name, n_name AS nation, c_acctbal,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned items: top 20 customers by revenue lost to returns in
    a half-year window. Date predicate prunes orders before the fact
    shuffle; returnflag prunes lineitem at the scan; TakeOrdered top-20
    with the customer key as deterministic tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal"
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                       AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer distribution: how many customers placed exactly k
    qualifying orders — including k=0, which is why the priority filter
    sits in the JOIN CONDITION, not a WHERE (a WHERE would silently drop
    the zero-order customers, the classic outer-join-filter bug). Two
    aggregations: the first shuffles on c_custkey, the second is over at
    most |distinct counts| rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 300)
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity exceeds 300
    units, top 20 by price. The IN-subquery of the original decorrelates
    to aggregate-then-join: group lineitem FIRST (map-side partials make
    this cheap), join the surviving ~1% of order keys back. Quantities are
    integer-valued doubles — summed as bigints, exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "disjunctive_bracket_revenue",
    oracle=f"""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def disjunctive_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 disjunctive predicates: three (brand, size-band, quantity-band)
    brackets OR-ed together. Catalyst factors the disjunction: the part
    side gets `p_brand IN (…) AND p_size <= 15` pushed to its scan, the
    lineitem side gets `l_quantity BETWEEN 1 AND 30` — the residual OR is
    evaluated post-join on already-pruned rows. That pushdown-through-OR
    is the whole point of the shape at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bracket)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        )
        .orderBy("p_brand")
    )


@query(
    "part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 parts/supplier relationship (lineitem is the part↔supplier
    bridge — the schema has no partsupp): distinct suppliers per
    (brand, type, size) over the size whitelist, excluding delinquent
    (negative-balance) suppliers via LEFT ANTI join — the decorrelated
    NOT IN. The distinct-agg plans as two-phase hash (partial distinct
    on (group, suppkey), then count) — no row explosion. The anti side
    is a handful of keys, broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "top_revenue_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: supplier(s) whose quarterly revenue equals the
    maximum. The view+scalar-subquery of the original becomes: aggregate
    once, checkpoint-free reuse via a broadcast 1-row max, equality
    filter. Equality on doubles is SAFE here because both sides are the
    same decimal-exact sums — bit-identical by construction (the
    invariant equality joins on dsum outputs rely on)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "best_balance_part_supplier",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    ranked AS (
      SELECT p_partkey, p_name, s_name, s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY p_partkey
                                ORDER BY s_acctbal DESC, s_suppkey)
               AS rk
      FROM pairs
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_type = 'LARGE' AND p_size <= 10)
    SELECT p_partkey, p_name, s_name, s_acctbal
    FROM ranked WHERE rk = 1
    ORDER BY s_acctbal DESC, p_partkey
    """,
)
def best_balance_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 min-cost supplier, adapted (no partsupp.ps_supplycost ⇒ pick the
    HIGHEST-balance supplier that has actually shipped the part, from the
    distinct lineitem bridge): the correlated `= (SELECT MIN…)` of the
    original decorrelates to a per-part window argmax — rank suppliers
    within each part, keep rank 1, suppkey as the deterministic tiebreak.
    The distinct pair set is tiny next to lineitem (map-side partial
    dedup); the window shuffles on p_partkey once."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    s = load_table(spark, sf_dir, "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    w = Window.partitionBy("p_partkey").orderBy(
        F.desc("s_acctbal"), "s_suppkey"
    )
    return (
        pairs.join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .join(F.broadcast(s), pairs.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "s_suppkey")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk", "s_suppkey")
        .orderBy(F.desc("s_acctbal"), "p_partkey")
    )


@query(
    "late_shipment_priority_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping modes, adapted (no shipmode/receiptdate ⇒ returnflag
    groups, "late" = shipped >60 days after order): conditional counts of
    high- vs low-priority orders among late shipments. The date-arithmetic
    predicate compares two columns post-join (not pushable) but the
    absolute ship-year window IS pushed to the lineitem scan. CASE-in-SUM
    keeps both counts in one pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )
