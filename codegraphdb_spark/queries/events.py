"""Event-stream analytics catalog (batch semantics over the ``events``
fixture; the same logic runs as Structured Streaming in
``codegraphdb_spark.streaming`` with watermarks).

These are driver-mandated extensions (SURVEY §2.H): windowed aggregation,
sessionization, within-key dedup, JSON prop extraction. Batch versions are
oracle-checked; streaming twins are pytest-checked (non-SQL-expressible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from codegraphdb_spark.queries._determinism import isum, sql_isum
from codegraphdb_spark.registry import query
from codegraphdb_spark.sources.tables import load_table

# events.value is an arbitrary double → scaled-integer exact summation
# (see _determinism.isum for why decimal casts don't work here).
SQL_DSUM_V = sql_isum("value")


@query(
    "events_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {SQL_DSUM_V} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute window aggregation — the batch shape of
    ``writeStream`` windowed aggs. Window+key grouping is a single shuffle
    with map-side partials; state size bounded by (windows × types)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            isum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sliding_window",
    oracle=f"""
    WITH slid AS (
      SELECT UNNEST([time_bucket(INTERVAL '5 minutes', ts),
                     time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
                    ]) AS window_start,
             value
      FROM events
    )
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {SQL_DSUM_V} AS total_value
    FROM slid
    GROUP BY 1 ORDER BY 1
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (10-minute length, 5-minute slide): each event lands in
    exactly two windows; Spark's ``window()`` explodes then aggregates."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            isum("value").alias("total_value"),
        )
        .select(F.col("window.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@query(
    "events_sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM marked
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) — the batch
    equivalent of ``session_window``; implemented with lag + cumulative sum
    so the oracle can mirror it exactly. Single shuffle on user_id; both
    window functions reuse the same partitioning (one sort, no extra
    exchange — check ``explain``)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # microsecond-exact gap (ts.cast('long') truncates to seconds and
    # would disagree with the oracle's full-precision interval compare
    # for gaps inside (1800 s, 1801 s))
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    marked = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    return (
        marked.withColumn("session_seq", F.sum("new_session").over(w_run).cast("bigint"))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_seq")
    )


@query(
    "events_dedup_first_per_key",
    oracle="""
    SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id, event_type
    """,
)
def events_dedup_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per (user, type) — batch shape of
    ``dropDuplicatesWithinWatermark``; deterministic tie-break by event_id."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "events_asof_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, ts, event_id AS click_event_id
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.click_event_id AS click_event_id_asof,
           c.ts AS ts_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operator Spark lacks, implemented as union+window in
    operators/asof.py): each purchase gets the user's most recent prior (or
    simultaneous) click. The oracle uses DuckDB's NATIVE ASOF JOIN — an
    independent implementation hash-matching ours."""
    from codegraphdb_spark.operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    return asof_join(
        purchases, clicks, key="user_id", ts="ts",
        payload_cols=["click_event_id", "ts"],
    ).orderBy("event_id")


@query(
    "events_range_join",
    oracle="""
    SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
           CAST(date_diff('second', a.ts, b.ts) AS BIGINT) AS gap_sec
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(date_diff('second', a.ts, b.ts)) <= 300
    ORDER BY event_a, event_b
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join — pairs of same-user events within 5 minutes —
    via the BUCKETIZED equi-join pattern: quantize ts to 5-minute buckets,
    replicate one side into its adjacent buckets, equi-join on
    (user, bucket), then exact-filter the band. Turns an inequality join
    (O(n_u²) probe) into a hash join whose fan-out is the bucket width —
    the only shape that survives 100 TB. Oracle is DuckDB's native
    inequality join: an independent implementation, hash-matched."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", (F.col("ts").cast("long")).alias("sec")
    )
    width = 300
    a = e.select(
        F.col("event_id").alias("event_a"),
        "user_id",
        F.col("sec").alias("sec_a"),
        F.explode(
            F.array(
                (F.floor(F.col("sec") / width) - 1).cast("long"),
                F.floor(F.col("sec") / width).cast("long"),
                (F.floor(F.col("sec") / width) + 1).cast("long"),
            )
        ).alias("bucket"),
    )
    b = e.select(
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("user_b"),
        F.col("sec").alias("sec_b"),
        F.floor(F.col("sec") / width).cast("long").alias("bucket"),
    )
    return (
        a.join(b, (a.user_id == b.user_b) & (a.bucket == b.bucket))
        .filter(
            (F.col("event_a") < F.col("event_b"))
            & (F.abs(F.col("sec_b") - F.col("sec_a")) <= width)
        )
        .select(
            "event_a",
            "event_b",
            "user_id",
            (F.col("sec_b") - F.col("sec_a")).cast("bigint").alias("gap_sec"),
        )
        # no dedup needed: the three a-side replicas carry DISTINCT bucket
        # ids and b carries exactly one, so a pair can match at most once —
        # a dropDuplicates here would be a whole wasted shuffle at scale
        .orderBy("event_a", "event_b")
    )


@query(
    "events_pivot_daily",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view,
           CAST(COUNT(*) AS BIGINT) AS total
    FROM events GROUP BY 1 ORDER BY day
    """,
)
def events_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity cross-tab: ``pivot`` with an EXPLICIT value list —
    at scale the list matters because pivot without one runs a separate
    distinct-values job over the corpus before the real aggregation; with
    it the plan is ONE hash aggregate whose map side emits a fixed-width
    count vector per day (the conditional-aggregation shape the oracle
    spells out). NULL-safe: count of an absent type is 0, not NULL."""
    e = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    day = F.to_date("ts").alias("day")
    pv = (
        e.select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .count()
    )
    out_cols = [F.col("day")]
    total = None
    for t in types:
        c = F.coalesce(F.col(t), F.lit(0)).cast("bigint")
        out_cols.append(c.alias(t))
        total = c if total is None else total + c
    out_cols.append(total.cast("bigint").alias("total"))
    return pv.select(*out_cols).orderBy("day")


@query(
    "events_rollup_report",
    oracle=f"""
    SELECT event_type,
           CAST(EXTRACT(year FROM ts) AS INT) AS y,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_isum('value')} AS total_value
    FROM events
    GROUP BY ROLLUP (event_type, CAST(EXTRACT(year FROM ts) AS INT))
    ORDER BY event_type NULLS FIRST, y NULLS FIRST
    """,
)
def events_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (engine extension beyond the reference's
    surface — SURVEY §2.G notes the reference has no grouping sets; the
    engine provides them). Same Expand-based plan as grouping sets; one
    shuffle."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.rollup("event_type", F.year("ts").cast("int").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            isum("value").alias("total_value"),
        )
        .orderBy(F.col("event_type").asc_nulls_first(), F.col("y").asc_nulls_first())
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
           event_type
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
    ORDER BY event_id
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (reference <CODE> pointer decode D3 is the
    same from_json shape, graphDB.py:236-247). get_json_object stays in
    codegen — no Python round-trip."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select("event_id", k.alias("prop_k"), "event_type")
        .filter(F.col("prop_k") >= 50)
        .orderBy("event_id")
    )


@query(
    "events_funnel",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), fc AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN fv ON e.user_id = fv.user_id AND e.ts > fv.t
      WHERE e.event_type = 'click' GROUP BY 1
    ), fp AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN fc ON e.user_id = fc.user_id AND e.ts > fc.t
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM fv
    UNION ALL
    SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM fc
    UNION ALL
    SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM fp
    ORDER BY stage
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click-after-view →
    purchase-after-click) by first-occurrence timestamps: each stage is a
    per-user MIN aggregation joined against the next event type with a
    strictly-later predicate. Three shuffles on user_id, each stage's
    state one row per surviving user — the batch twin of a stateful
    streaming funnel (applyInPandasWithState)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    fc = (
        e.filter(F.col("event_type") == "click")
        .join(fv.withColumnRenamed("t", "prev_t"), "user_id")
        .filter(F.col("ts") > F.col("prev_t"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fc.withColumnRenamed("t", "prev_t"), "user_id")
        .filter(F.col("ts") > F.col("prev_t"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(fv, "1_view")
        .unionByName(stage(fc, "2_click"))
        .unionByName(stage(fp, "3_purchase"))
        .orderBy("stage")
    )


# --- retention cohorts --------------------------------------------------------

@query(
    "events_retention_cohorts",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             -- floor division (not //, which truncates toward zero and
             -- would diverge from Spark's F.floor for pre-epoch days)
             CAST(FLOOR(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
                        / 7.0) AS INT) AS week
      FROM events
    ), firsts AS (
      SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id
    ), j AS (
      SELECT ev.user_id, f.cohort_week, ev.week - f.cohort_week AS week_age
      FROM ev JOIN firsts f USING (user_id)
    ), sizes AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_week
    )
    SELECT j.cohort_week, j.week_age,
           CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS n_active,
           s.cohort_size,
           CAST(CAST(COUNT(DISTINCT j.user_id) AS DOUBLE) / s.cohort_size
                AS DOUBLE) AS retention
    FROM j JOIN sizes s USING (cohort_week)
    GROUP BY j.cohort_week, j.week_age, s.cohort_size
    ORDER BY cohort_week, week_age
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by week of first activity;
    each cell counts distinct users of that cohort active N weeks later.
    Three aggregates, all key-partitioned: first-seen per user (one
    shuffle on user_id), cohort sizes (tiny — broadcast back), and the
    (cohort, age) distinct-count. The retention ratio is a single
    int/int→double division (cross-engine exact). At 100 TB the first-seen
    table is the only corpus-sized intermediate and it shuffles one row
    per user — everything downstream is cohort-cardinality."""
    e = load_table(spark, sf_dir, "events")
    week = F.floor(
        F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("2024-01-01"))) / 7
    ).cast("int")
    ev = e.select("user_id", week.alias("week"))
    # r11 (guide §2.4): cohort_week as a user-partitioned window MIN
    # instead of groupBy(user_id) + join-back — one scan and one
    # user-keyed exchange instead of two of each (ReuseExchange never
    # fired across the partial-aggregate boundary, the same shape fixed
    # for exclusive_late_supplier/doc_tfidf in r10). cohort_size needs no
    # separate aggregate either: a user's first week is active by
    # definition, so the week_age=0 cell's distinct-user count IS the
    # cohort size — recover it with a window over the (tiny) aggregated
    # cohort grid. Same rows, same values (oracle-checked).
    j = ev.select(
        "user_id",
        F.min("week").over(Window.partitionBy("user_id")).alias("cohort_week"),
        "week",
    ).select(
        "user_id",
        "cohort_week",
        (F.col("week") - F.col("cohort_week")).alias("week_age"),
    )
    agg = j.groupBy("cohort_week", "week_age").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active")
    )
    cohort_size = F.max(
        F.when(F.col("week_age") == 0, F.col("n_active"))
    ).over(Window.partitionBy("cohort_week"))
    return (
        agg.select(
            "cohort_week",
            "week_age",
            "n_active",
            cohort_size.cast("bigint").alias("cohort_size"),
        )
        .select(
            "cohort_week",
            "week_age",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size"))
            .cast("double")
            .alias("retention"),
        )
        .orderBy("cohort_week", "week_age")
    )


# --- time-series resample + LOCF gap fill -------------------------------------

@query(
    "events_gap_fill_locf",
    oracle=f"""
    WITH grid AS (
      SELECT u.user_id, d.day
      FROM (SELECT DISTINCT user_id FROM events) u,
           (SELECT UNNEST(generate_series(0, 29)) AS day) d
    ), daily AS (
      SELECT user_id,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT)
               AS day,
             {sql_isum('value')} AS day_value,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), joined AS (
      SELECT g.user_id, CAST(g.day AS INT) AS day, d.day_value, d.n_events
      FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    )
    SELECT user_id, day,
           COALESCE(n_events, 0) AS n_events,
           CAST(LAST_VALUE(day_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS filled_value,
           day_value IS NULL AS was_gap
    FROM joined
    ORDER BY user_id, day
    """,
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling onto a dense daily grid with LOCF
    (last-observation-carried-forward) gap fill — the standard feature-
    engineering shape for activity series. The grid is users × 30 days
    (explode of a sequence — no data shuffle to build it); the daily
    aggregate is one shuffle on (user, day); the fill is one window pass
    per user. Days before a user's first observation stay NULL (honest
    missingness) — COALESCE at the edge if a model needs zeros. At 100 TB
    the grid is |users|×|days| rows of three integers: smaller than the
    event corpus, and the LOCF window never materializes more than one
    partition's run."""
    e = load_table(spark, sf_dir, "events")
    day = F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("2024-01-01"))).cast("int")
    daily = e.groupBy(F.col("user_id"), day.alias("day")).agg(
        isum("value").alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    users = e.select("user_id").distinct()
    grid = users.select(
        "user_id", F.explode(F.sequence(F.lit(0), F.lit(29))).alias("day")
    ).select("user_id", F.col("day").cast("int").alias("day"))
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("day_value", ignorenulls=True).over(w).cast("double").alias("filled_value"),
            F.col("day_value").isNull().alias("was_gap"),
        )
        .orderBy("user_id", "day")
    )


# --- z-score anomaly flagging -------------------------------------------------

_ZS = 100  # event values are 2-decimal: scale 100 is exact, squares stay in int64


@query(
    "events_anomaly_zscore",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             CAST(CAST(SUM(CAST(ROUND(value * {_ZS}) AS BIGINT)) AS DOUBLE)
                  / {_ZS} / COUNT(*) AS DOUBLE) AS mu,
             GREATEST(CAST(CAST(SUM(CAST(ROUND(value * {_ZS}) AS BIGINT)
                           * CAST(ROUND(value * {_ZS}) AS BIGINT)) AS DOUBLE)
                  / {_ZS} / {_ZS} / COUNT(*)
                  - (CAST(SUM(CAST(ROUND(value * {_ZS}) AS BIGINT)) AS DOUBLE)
                     / {_ZS} / COUNT(*))
                    * (CAST(SUM(CAST(ROUND(value * {_ZS}) AS BIGINT)) AS DOUBLE)
                       / {_ZS} / COUNT(*))
                  AS DOUBLE), 0.0) AS var
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST((e.value - s.mu) / SQRT(s.var) AS DOUBLE) AS z,
           ABS((e.value - s.mu) / SQRT(s.var)) > 3 AS is_anomaly
    FROM events e JOIN s USING (event_type)
    ORDER BY e.event_id
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier flagging per event type: one tiny
    grouped-moments aggregate (scaled-integer sums — exact and
    order-independent, same convention as emb_dim_stats) broadcast back
    over the stream, then a pure map-side projection. sqrt and the final
    divisions are single IEEE ops on identical doubles, so the z values
    are bit-identical cross-engine. At 100 TB this is the cheapest
    anomaly pass there is: one map-side-combined aggregate over k event
    types + one broadcast join; nothing corpus-sized shuffles."""
    e = load_table(spark, sf_dir, "events")
    sv = F.round(F.col("value") * _ZS).cast("bigint")
    n = F.count(F.lit(1))
    s1 = F.sum(sv).cast("double")
    # decimal(38,0) sum of squares: exact, order-independent, and no
    # int64 ceiling at trillion-row per-type counts (DuckDB's SUM(BIGINT)
    # is already int128) — same hardening as the CUSUM/emb moments
    s2 = F.sum((sv * sv).cast("decimal(38,0)")).cast("double")
    mu = (s1 / _ZS / n).cast("double")
    stats = e.groupBy("event_type").agg(
        mu.alias("mu"),
        # clamp: near-constant types can round the subtraction slightly
        # negative — Spark sqrt would NaN, the DuckDB oracle would error
        F.greatest((s2 / _ZS / _ZS / n - mu * mu).cast("double"), F.lit(0.0)).alias(
            "var"
        ),
    )
    z = (F.col("value") - F.col("mu")) / F.sqrt(F.col("var"))
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            z.cast("double").alias("z"),
            (F.abs(z) > 3).alias("is_anomaly"),
        )
        .orderBy("event_id")
    )


@query(
    "events_top_paths",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path LIMIT 20
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining lite — the product-analytics 'top paths' report:
    each user's first five event types (by time, event_id tie-break)
    joined into a path string; paths ranked by user count, top 20.

    Scale: ONE user-keyed shuffle feeds the window; the rank filter cuts
    each user to 5 rows before the collect, so the path build never holds
    an unbounded per-user array (contrast a naive collect_list of ALL
    events per user — a straggler user would OOM an executor at 100 TB);
    the path frequency agg partial-aggregates and the top-20 is a
    TakeOrdered, never a global sort."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 5)
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(20)
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT prev_type, sum(n) AS t FROM trans GROUP BY 1)
    SELECT trans.prev_type, trans.next_type, CAST(trans.n AS BIGINT) AS n,
           CAST((1000000 * trans.n) // tot.t AS BIGINT) AS p_scaled
    FROM trans JOIN tot ON tot.prev_type = trans.prev_type
    ORDER BY trans.prev_type, trans.next_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    P(next | prev) as floor(1e6·n / row-total) — the behavioral-model
    fit behind funnel simulation and anomaly scoring, in exact integer
    arithmetic. lag() pairs consecutive events per user (ts, event_id
    tie-break — same ordering contract as events_top_paths).

    Scale: one user-keyed shuffle for the lag window; the transition agg
    is event-type² bounded (map-side partials), the row-total join is a
    broadcast of k² rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = trans.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return (
        trans.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("bigint").alias("n"),
            F.expr("(1000000 * n) div t").cast("bigint").alias("p_scaled"),
        )
        .orderBy("prev_type", "next_type")
    )


# --- time-series downsampling -------------------------------------------------

@query(
    "events_ohlc_bars",
    oracle="""
    WITH ranked AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bar_day, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts), event_type
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('day', ts), event_type
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events)
    SELECT bar_day, event_type,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE)
                / 1000000 AS DOUBLE) AS volume
    FROM ranked
    GROUP BY bar_day, event_type
    ORDER BY bar_day, event_type
    """,
)
def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC downsampling bars per event type — the hypertable /
    financial-tick rollup shape. ONE shuffle: the two row_number windows
    and the final groupBy share the same (day, type) partitioning, so
    Spark plans a single exchange + per-partition sort; open/close are
    picked (not summed) doubles with a unique (ts, event_id) tiebreak, and
    volume sums exactly in the scaled-integer domain. At 100 TB the state
    per group is O(1) and groups = days × instruments — this is the
    canonical downsample that turns a tick firehose into a bounded table."""
    e = load_table(spark, sf_dir, "events")
    e = e.withColumn("bar_day", F.date_trunc("day", F.col("ts")))
    w_a = Window.partitionBy("bar_day", "event_type").orderBy("ts", "event_id")
    w_d = Window.partitionBy("bar_day", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = e.select(
        "bar_day",
        "event_type",
        "value",
        F.row_number().over(w_a).alias("rn_a"),
        F.row_number().over(w_d).alias("rn_d"),
    )
    return (
        ranked.groupBy("bar_day", "event_type")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
            isum("value").alias("volume"),
        )
        .orderBy("bar_day", "event_type")
    )


_EWMA_HORIZON = 8  # lags; weight of lag i is 2^(HORIZON-1-i) — alpha = 1/2


@query(
    "events_ewma",
    oracle=f"""
    WITH scaled AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(value * 1000000) AS BIGINT) AS sv
      FROM events),
    lagged AS (
      SELECT event_id, user_id, ts,
             {', '.join(f"LAG(sv, {i}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sv_{i}" if i else "sv AS sv_0" for i in range(8))}
      FROM scaled)
    SELECT event_id, user_id, ts,
           CAST(CAST({' + '.join(f"COALESCE(sv_{i} * {1 << (7 - i)}, 0)" for i in range(8))} AS DOUBLE)
                / CAST({' + '.join(f"CASE WHEN sv_{i} IS NOT NULL THEN {1 << (7 - i)} ELSE 0 END" for i in range(8))} AS DOUBLE)
                / 1000000.0 AS DOUBLE) AS ewma
    FROM lagged
    ORDER BY event_id
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (alpha = 1/2,
    truncated at 8 lags) — smoothing for anomaly baselines. Exact
    cross-engine: values scale to integers, the power-of-two weights
    (128, 64, …, 1) keep the weighted sum in int64 (|sv| ≤ 5·10⁸ × 255
    « 2⁶³), and the two final divisions are single exactly-rounded IEEE
    ops. ONE shuffle on user_id; all 8 lags ride one window sort. The
    truncation is what makes this scale: state per row is O(horizon),
    not O(history), so the same plan runs as a streaming window."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sv = F.round(F.col("value") * 1000000).cast("bigint")
    df = e.select("event_id", "user_id", "ts", sv.alias("sv_0"))
    for i in range(1, _EWMA_HORIZON):
        df = df.withColumn(f"sv_{i}", F.lag("sv_0", i).over(w))
    num = None
    den = None
    for i in range(_EWMA_HORIZON):
        weight = 1 << (_EWMA_HORIZON - 1 - i)
        term = F.coalesce(F.col(f"sv_{i}") * weight, F.lit(0))
        hit = F.when(F.col(f"sv_{i}").isNotNull(), F.lit(weight)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = hit if den is None else den + hit
    return df.select(
        "event_id",
        "user_id",
        "ts",
        (num.cast("double") / den.cast("double") / F.lit(1000000.0))
        .cast("double")
        .alias("ewma"),
    ).orderBy("event_id")


@query(
    "events_salted_type_stats",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {SQL_DSUM_V} AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_salted_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over MAXIMALLY skewed keys (five event types over the
    whole corpus — every key is hot) through operators/skew.py::
    salted_aggregate: phase 1 groups on (key, content-derived salt) so
    each hot key's partials spread over 16 reducers, phase 2 merges the
    tiny (key × salt) table. Same result as plain groupBy — the oracle IS
    the plain GROUP BY — but no single reducer ever sees a whole hot key,
    which is the difference between a straggler and a flat stage profile
    at 100 TB. All aggregates are algebraic (count/scaled-int-sum/min/max
    re-merge exactly), so the two-phase split cannot change the answer."""
    from codegraphdb_spark.operators.skew import salted_aggregate

    e = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        e.select("event_type", "value"),
        ["event_type"],
        partial_aggs={
            "n_events": F.count(F.lit(1)),
            "sv": F.sum(F.round(F.col("value") * 1000000).cast("bigint")),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
        merge_aggs={
            "n_events": F.sum("n_events").cast("bigint"),
            "sv": F.sum("sv"),
            "min_value": F.min("min_value"),
            "max_value": F.max("max_value"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        (F.col("sv").cast("double") / 1000000).cast("double").alias("total_value"),
        "min_value",
        "max_value",
    ).orderBy("event_type")


@query(
    "events_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(ROUND(value * 100) AS BIGINT) AS sv,
             epoch_ms(ts) AS ms,
             LEAD(epoch_ms(ts)) OVER (
               PARTITION BY user_id, date_trunc('day', ts)
               ORDER BY ts, event_id) AS next_ms
      FROM events)
    SELECT user_id, day,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(CAST(SUM(sv * (next_ms - ms)) AS DOUBLE)
                / CAST(SUM(next_ms - ms) AS DOUBLE) / 100.0 AS DOUBLE) AS twa
    FROM seq
    WHERE next_ms IS NOT NULL
    GROUP BY user_id, day
    HAVING SUM(next_ms - ms) > 0
    ORDER BY user_id, day
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over IRREGULAR samples (the timescale
    `time_weight` shape): each reading is weighted by how long it was the
    latest value (left-Riemann over intra-day gaps; the day's last reading
    carries no interval). Exact cross-engine: 2-dp values scale to ints,
    weights are epoch-millisecond deltas, num/den are int64 sums
    (49002 × 86.4e6 ms × events/day ≪ 2⁶³) and the two divisions are
    single exactly-rounded IEEE ops. ONE shuffle on (user, day): the
    LEAD window and the aggregate share the partitioning."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        day.alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("sv"),
        F.unix_millis("ts").alias("ms"),
        "ts",
        "event_id",
    ).withColumn("next_ms", F.lead("ms").over(w))
    dt = F.col("next_ms") - F.col("ms")
    return (
        seq.filter(F.col("next_ms").isNotNull())
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum(F.col("sv") * dt).alias("num"),
            F.sum(dt).alias("den"),
        )
        .filter(F.col("den") > 0)
        .select(
            "user_id",
            "day",
            "n_intervals",
            (F.col("num").cast("double") / F.col("den").cast("double") / F.lit(100.0))
            .cast("double")
            .alias("twa"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "events_rollup_two_level",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {SQL_DSUM_V} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def events_rollup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate reuse (the hypertable rollup pattern): DAILY
    bars computed FROM HOURLY partials instead of raw ticks — counts and
    scaled-int sums re-aggregate exactly, so the two-level result is
    bit-identical to the direct daily aggregate (which is what the oracle
    computes). At 100 TB this is the difference between re-scanning the
    tick firehose for every coarser resolution and folding 24 hourly rows
    per day: materialize the finest rollup once, derive every coarser one
    from it. The scaled sum stays an INTEGER through the partial level —
    dividing only at the end is what makes re-aggregation lossless."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 1000000).cast("bigint")).alias("sv"),
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", F.col("hour")).alias("day"), "event_type"
        )
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            (F.sum("sv").cast("double") / 1000000).cast("double").alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "events_hourly_full_outer",
    oracle="""
    WITH p AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    e AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'error' GROUP BY 1)
    SELECT coalesce(p.h, e.h) AS hour,
           p.n AS n_purchases,
           e.n AS n_errors,
           CAST(coalesce(p.n, 0) - coalesce(e.n, 0) AS BIGINT) AS purchase_surplus
    FROM p FULL OUTER JOIN e ON p.h = e.h
    ORDER BY hour
    """,
)
def events_hourly_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join type §2.G's inner/left/semi/anti rows
    didn't cover): hourly purchase vs error counts, keeping hours where
    either side is absent — sparse-series alignment, the co-analysis shape
    reporting stacks hit constantly. NULL counts stay NULL (absence ≠
    zero) while the surplus coalesces explicitly. Both inputs aggregate
    BEFORE the join, so the full-outer matches tiny per-hour partials,
    not raw events; the two aggregates and the join all hash on the same
    hour key."""
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(hour.alias("h_p"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
    )
    er = (
        e.filter(F.col("event_type") == "error")
        .groupBy(hour.alias("h_e"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_errors"))
    )
    return (
        p.join(er, F.col("h_p") == F.col("h_e"), "full_outer")
        .select(
            F.coalesce("h_p", "h_e").alias("hour"),
            "n_purchases",
            "n_errors",
            (
                F.coalesce("n_purchases", F.lit(0))
                - F.coalesce("n_errors", F.lit(0))
            )
            .cast("bigint")
            .alias("purchase_surplus"),
        )
        .orderBy("hour")
    )


@query(
    "events_unpivot_daily",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
)
def events_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: the wide daily cross-tab folded back to long form,
    absent cells dropped. The oracle is the DIRECT long-form aggregate —
    asserting the algebraic identity unpivot(pivot(x)) = groupBy(x),
    which is the real guarantee a reporting stack needs before trusting
    melt on a 100 TB cross-tab. Spark's ``unpivot`` is a zero-shuffle
    Expand over the already-tiny wide table (one row per day), so the
    round-trip costs one extra narrow stage, not a second scan of the
    corpus."""
    e = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        e.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .count()
    )
    return (
        wide.unpivot(
            ids=["day"],
            values=types,
            variableColumnName="event_type",
            valueColumnName="n",
        )
        .filter(F.col("n") > 0)
        .select("day", "event_type", F.col("n").cast("bigint").alias("n"))
        .orderBy("day", "event_type")
    )


@query(
    "events_value_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, CAST(quantile_cont(value, 0.5) AS DOUBLE) AS median_value
      FROM events GROUP BY event_type)
    SELECT e.event_type, m.median_value,
           CAST(quantile_cont(abs(e.value - m.median_value), 0.5) AS DOUBLE) AS mad
    FROM events e JOIN med m ON m.event_type = e.event_type
    GROUP BY e.event_type, m.median_value
    ORDER BY e.event_type
    """,
)
def events_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion: median absolute deviation per event type — the
    outlier-resistant sibling of events_anomaly_zscore's moments. Two
    exact percentile passes (Spark ``percentile`` == DuckDB
    ``quantile_cont``, bit-identical sort-and-interpolate); the residual
    |x − median| is one exactly-rounded IEEE op, and the 5-row median
    table re-enters as a broadcast join. At 100 TB both passes swap for
    t-digest ``percentile_approx`` — kept exact here for the oracle."""
    e = load_table(spark, sf_dir, "events")
    med = (
        e.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").cast("double").alias("median_value"))
    )
    return (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "median_value")
        .agg(
            F.expr("percentile(abs(value - median_value), 0.5)")
            .cast("double")
            .alias("mad")
        )
        .orderBy("event_type")
    )


@query(
    "events_seasonality_profile",
    oracle=f"""
    SELECT CAST(isodow(ts) AS INT) AS day_of_week,
           CAST(hour(ts) AS INT) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {SQL_DSUM_V} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY day_of_week, hour_of_day
    """,
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality fingerprint: (ISO day-of-week × hour-of-day) activity
    profile — the 168-cell heatmap behind load forecasting and
    anomaly-baseline seasonal adjustment. One shuffle over at most 168
    keys with map-side partials doing nearly all the work: at 100 TB the
    exchange moves a few thousand partial rows, full stop. Scaled-int
    value sums keep the cells hashable cross-engine."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.dayofweek(F.col("ts")).alias("dow_raw"),
            F.hour(F.col("ts")).cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            isum("value").alias("total_value"),
        )
        .select(
            # Spark dayofweek: 1=Sunday; ISO (DuckDB isodow): 1=Monday
            F.when(F.col("dow_raw") == 1, 7)
            .otherwise(F.col("dow_raw") - 1)
            .cast("int")
            .alias("day_of_week"),
            "hour_of_day",
            "n_events",
            "total_value",
        )
        .orderBy("day_of_week", "hour_of_day")
    )


# --- CUSUM drift / change-point detection --------------------------------------

# CUSUM scale: 1e4 keeps the running prefix sums comfortably inside int64
# (|P_i| <= n * spread * scale ~= 1e5 * 1e3 * 1e4 = 1e12 per event type at
# sf0.1; the 2^63 ceiling is ~9e18, giving ~6 orders of headroom — at true
# 100 TB per-key row counts you widen to DECIMAL(38,0) partial sums).
_CUSUM_SCALE = 10_000


@query(
    "events_cusum_drift",
    oracle=f"""
    WITH sv AS (
      SELECT event_id, event_type, ts,
             CAST(ROUND(value * {_CUSUM_SCALE}) AS BIGINT) AS v
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(ROUND(CAST(SUM(v) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mu_i,
             CAST(ROUND(SQRT(GREATEST(
               CAST(SUM(v * v) AS DOUBLE) / COUNT(*)
               - (CAST(SUM(v) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(v) AS DOUBLE) / COUNT(*)),
               0.0
             ))) AS BIGINT) AS sigma_i
      FROM sv GROUP BY event_type
    ),
    pre AS (
      SELECT sv.event_id, sv.event_type, sv.ts, sv.v - st.mu_i AS d,
             st.sigma_i, st.sigma_i // 2 AS k
      FROM sv JOIN stats st USING (event_type)
    ),
    psum AS (
      SELECT event_id, event_type, ts, sigma_i,
             SUM(d) OVER (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS p,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS rn,
             k
      FROM pre
    ),
    ab AS (
      SELECT event_id, event_type, ts, sigma_i,
             p - rn * k AS a, p + rn * k AS b
      FROM psum
    ),
    run AS (
      SELECT event_id, event_type, sigma_i, a, b,
             min(a) OVER w AS amin,
             max(b) OVER w AS bmax
      FROM ab
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, event_type,
           CAST(CAST(a - least(amin, 0) AS DOUBLE) / {_CUSUM_SCALE} AS DOUBLE)
               AS cusum_pos,
           CAST(CAST(greatest(bmax, 0) - b AS DOUBLE) / {_CUSUM_SCALE} AS DOUBLE)
               AS cusum_neg,
           CAST(CASE WHEN a - least(amin, 0) > 8 * sigma_i
                       OR greatest(bmax, 0) - b > 8 * sigma_i
                     THEN 1 ELSE 0 END AS INT) AS drift_flag
    FROM run
    ORDER BY event_id
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point statistic per event type — the drift
    monitor a training-data pipeline runs over feature streams. The
    textbook recursion S_i = max(0, S_{i-1} + (x_i - mu -+ k)) (slack
    k = sigma/2, so stationary noise decays instead of random-walking) is
    not a SQL window, but it telescopes: with A_i = P_i - i*k and
    B_i = P_i + i*k over the deviation prefix sums P,

        S+_i = A_i - min(0, min_{m<=i} A_m)
        S-_i = max(0, max_{m<=i} B_m) - B_i

    so BOTH sides come out of one event_type exchange and a stack of
    same-frame running windows. All accumulation is scaled-int (exact,
    order-independent); the drift gate compares integers against an
    8-sigma integer threshold (sigma from exact scaled moments, one
    correctly-rounded sqrt — bit-identical cross-engine); the reported
    statistics are single int64/int64 IEEE divisions. Scale: one shuffle
    by event_type + a broadcast of k per-type moment rows; the windows
    are key-local and stream."""
    e = load_table(spark, sf_dir, "events")
    sv = e.select(
        "event_id",
        "event_type",
        "ts",
        F.round(F.col("value") * _CUSUM_SCALE).cast("bigint").alias("v"),
    )
    n = F.count(F.lit(1))
    s1 = F.sum("v").cast("double")
    # v*v fits int64 (|v| < 3e9 for the documented value range) but the
    # SUM of squares does not — route it through DECIMAL(38,0), which is
    # exact and order-independent like the int sums; DuckDB's SUM(BIGINT)
    # is already int128, so both engines produce the identical double
    s2 = F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).cast("double")
    stats = sv.groupBy("event_type").agg(
        F.round(s1 / n).cast("bigint").alias("mu_i"),
        # greatest(,0): for a (near-)constant type the double subtraction
        # can round a hair negative — clamp so sqrt never sees it (Spark
        # would yield NaN; DuckDB SQRT would hard-error), same clamp as
        # the oracle
        F.round(F.sqrt(F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0))))
        .cast("bigint")
        .alias("sigma_i"),
    )
    pre = sv.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "ts",
        (F.col("v") - F.col("mu_i")).alias("d"),
        "sigma_i",
        F.floor(F.col("sigma_i") / 2).cast("bigint").alias("k"),
    )
    wrun = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    word = Window.partitionBy("event_type").orderBy("ts", "event_id")
    psum = pre.select(
        "event_id",
        "event_type",
        "ts",
        "sigma_i",
        F.sum("d").over(wrun).alias("p"),
        F.row_number().over(word).alias("rn"),
        "k",
    )
    ab = psum.select(
        "event_id",
        "event_type",
        "ts",
        "sigma_i",
        (F.col("p") - F.col("rn") * F.col("k")).alias("a"),
        (F.col("p") + F.col("rn") * F.col("k")).alias("b"),
    )
    run = ab.select(
        "event_id",
        "event_type",
        "sigma_i",
        "a",
        "b",
        F.min("a").over(wrun).alias("amin"),
        F.max("b").over(wrun).alias("bmax"),
    )
    s_pos = F.col("a") - F.least(F.col("amin"), F.lit(0))
    s_neg = F.greatest(F.col("bmax"), F.lit(0)) - F.col("b")
    return run.select(
        "event_id",
        "event_type",
        (s_pos.cast("double") / _CUSUM_SCALE).alias("cusum_pos"),
        (s_neg.cast("double") / _CUSUM_SCALE).alias("cusum_neg"),
        F.when(
            (s_pos > 8 * F.col("sigma_i")) | (s_neg > 8 * F.col("sigma_i")), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("drift_flag"),
    ).orderBy("event_id")


@query(
    "events_user_features",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS INT) AS n_types,
           CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
           CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
           CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS active_span_s,
           {sql_isum("value")} AS total_value,
           CAST(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS DOUBLE)
                / 1000000 / COUNT(*) AS DOUBLE) AS mean_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity feature extraction — the feature-store step a training
    pipeline runs before model fitting: one grouped pass emitting event
    counts, per-type conditional counts (the pivot columns a downstream
    model consumes), activity span, and exact-sum value statistics
    (scaled-int, so total/mean are bit-identical cross-engine; the mean's
    two divisions are performed in the same order by both engines).
    Scale: ONE map-side-combinable aggregate over user_id — conditional
    counts are SUM(CASE) partials, no joins, no second pass; this is the
    cheapest possible shape for a 100 TB feature sweep and AQE handles
    hot users via partial aggregation."""
    e = load_table(spark, sf_dir, "events")
    sv = F.round(F.col("value") * 1_000_000).cast("bigint")

    def cnt(t: str) -> Column:
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast(
            "bigint"
        )

    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_distinct("event_type").cast("int").alias("n_types"),
            cnt("click").alias("n_click"),
            cnt("view").alias("n_view"),
            cnt("purchase").alias("n_purchase"),
            cnt("error").alias("n_error"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
            .cast("bigint")
            .alias("active_span_s"),
            (F.sum(sv).cast("double") / 1_000_000).cast("double").alias("total_value"),
            (F.sum(sv).cast("double") / 1_000_000 / F.count(F.lit(1)))
            .cast("double")
            .alias("mean_value"),
        )
        .orderBy("user_id")
    )


@query(
    "events_session_duration_stats",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL '30 minutes'
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_seq,
             ts
      FROM marked
    ), per_session AS (
      SELECT user_id, session_seq,
             date_diff('microsecond', MIN(ts), MAX(ts)) AS dur_us,
             COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_seq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (n_events = 1) AS BIGINT) AS n_singletons,
           CAST(quantile_cont(dur_us, 0.5) AS DOUBLE) AS p50_dur_us,
           CAST(quantile_cont(dur_us, 0.9) AS DOUBLE) AS p90_dur_us,
           CAST(MAX(dur_us) AS BIGINT) AS max_dur_us,
           CAST(MAX(n_events) AS BIGINT) AS max_events
    FROM per_session
    """,
)
def events_session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-quality summary over the gap-based sessions (30-minute
    inactivity, the events_sessionization shape): session count,
    single-event sessions, exact p50/p90 duration (microsecond-integer
    durations through Spark `percentile` == DuckDB `quantile_cont`,
    bit-identical interpolation), and maxima. One user_id shuffle for the
    windows, one grouped agg, one scalar agg — the per-session table is
    users x sessions, tiny next to the event stream."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    marked = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    per_session = (
        marked.withColumn("session_seq", F.sum("new_session").over(w_run))
        .groupBy("user_id", "session_seq")
        .agg(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return per_session.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_singletons"),
        F.expr("percentile(dur_us, 0.5)").cast("double").alias("p50_dur_us"),
        F.expr("percentile(dur_us, 0.9)").cast("double").alias("p90_dur_us"),
        F.max("dur_us").cast("bigint").alias("max_dur_us"),
        F.max("n_events").cast("bigint").alias("max_events"),
    )
