"""Fixture-table source (parquet scans with pruning-friendly access).

The engine's relational inputs are the driver fixtures (TESTDATA.md).
Always go through :func:`load_table` so every query starts from a plain
``spark.read.parquet`` scan — Catalyst then gets predicate pushdown and
column pruning for free (verify with ``df.explain``: ``PushedFilters`` /
``ReadSchema`` should reflect the query's filters/projection).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (region and
# nation are fixed-size in TPC-H-like schemas; supplier stays tiny here).
BROADCAST_TABLES = frozenset({"region", "nation"})

_EVENTS_CONF_LOCK = threading.Lock()

# --- scan-width guard (optimization guide §2.5 "input skew": one huge
# unsplittable file). A parquet file is splittable only at ROW-GROUP
# boundaries; the bench fixtures (and any compacted upstream export) are
# written as a SINGLE row group, so a bare scan — and every map-side
# stage fused above it (filter, hash, partial aggregate, Arrow encode) —
# runs on ONE core no matter how many the session has (measured: the
# whole TPC-H-family map side single-threaded on local[32]; pricing
# summary 1.42s -> 0.80s from this change alone). When the file cannot
# feed the session's cores, repartition immediately after the read, on a
# DETERMINISTIC high-cardinality key (guide §2.5: never rand-derived —
# retried tasks must reproduce the same row placement; a keyed exchange
# also skips round-robin's sortBeforeRepartition pass). The condition is
# layout-adaptive, not tuned for local mode: at production scale a scan
# has thousands of row groups, the guard is false, and the plan is
# untouched — exactly the scan the 100 TB story wants.
#
# Filters and column pruning push THROUGH RepartitionByExpression, so
# selective queries shuffle only surviving rows of needed columns.
#
# OPT-IN, not blanket (measured, interleaved fresh-session A/B over 20
# representative queries, 2 sessions x 3 reps per side): the spread wins
# ONLY where the work fused above the scan is heavy relative to one
# shuffle round-trip of the filtered rows AND the query would not
# shuffle immediately anyway — wide decimal partial aggregates
# (pricing_summary 1.35->0.92 warm / 1.81->1.49 cold), KMV hashing
# (approx_distinct_kmv_by_flag 1.64->1.17). Everywhere the plan's FIRST
# exchange is nearby (joins, windows, explode->groupBy), the spread just
# doubles the shuffles and LOSES (events_tumbling_window 0.38->0.67,
# doc_top_collocations 0.52->0.90, join_part_supplier_lineitem
# 0.74->1.05; 20-query set total 18.4s -> 21.1s blanket-on). Callers
# that match the winning shape pass spread=True.

# deterministic spread key per table (the natural unique/high-cardinality
# key; pruning keeps it narrow — one extra int column at worst)
_SPREAD_KEY = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# below this the single-task scan is already sub-50ms and the exchange
# would only add a stage (supplier/nation/region class)
_MIN_ROWS_TO_SPREAD = 2_000

# (path, mtime) -> (n_row_groups, n_rows): one driver-side footer read per
# fixture file — layout metadata, never results
_LAYOUT_MEMO: dict[tuple[str, float], tuple[int, int]] = {}


def _parquet_layout(path: str) -> tuple[int, int] | None:
    """(n_row_groups, n_rows) of a single-file parquet fixture, or None
    when the layout can't/needn't be probed (a Spark-written DIRECTORY
    scan already splits per file; non-local paths skip the guard)."""
    try:
        if os.path.isdir(path):
            return None
        key = (path, os.path.getmtime(path))
        if key not in _LAYOUT_MEMO:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(path).metadata
            _LAYOUT_MEMO[key] = (md.num_row_groups, md.num_rows)
        return _LAYOUT_MEMO[key]
    except Exception:  # noqa: BLE001 — pyarrow raises ArrowInvalid on a
        # malformed file and the lazy import can raise ImportError; the
        # guard is an optional optimization and must never fail the read
        return None


def _spread_scan(df: DataFrame, name: str, path: str) -> DataFrame:
    # measurement/ops kill-switch: disable every opt-in spread without
    # touching call sites (used for the per-site cold A/Bs; a production
    # multi-row-group layout never reaches the repartition anyway)
    if os.environ.get("SPARK_GRAFT_NO_SPREAD"):
        return df
    key = _SPREAD_KEY.get(name)
    if key is None:
        return df
    layout = _parquet_layout(path)
    if layout is None:
        return df
    n_groups, n_rows = layout
    par = df.sparkSession.sparkContext.defaultParallelism
    if n_groups >= par or n_rows < _MIN_ROWS_TO_SPREAD:
        return df
    return df.repartition(par, F.xxhash64(F.col(key)))


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name in BROADCAST_TABLES:
        # fixed-size dims at any scale factor: hint them broadcast at load
        # so every consumer's dim join plans broadcast-hash without each
        # query restating the hint
        return F.broadcast(spark.read.parquet(path))
    if name == "events":
        # events.parquet's ts physical type has varied across fixture
        # generations: TIMESTAMP(NANOS) (vectorized reader rejects it —
        # read nanos as long, truncate to micros, same as DuckDB's ns→us
        # cast) or plain timestamp[us] without tz (Spark reads
        # TIMESTAMP_NTZ, which disallows cast-to-long). Normalize both to
        # TimestampType; the session tz is pinned to UTC so NTZ→LTZ is a
        # value-preserving bijection and oracles agree.
        # conf is SCOPED to this read (schema resolves at read time;
        # verified that execution after restore still works) — leaving it
        # set session-wide would silently turn every later nanos-parquet
        # read into bigint columns far from the cause
        _K = "spark.sql.legacy.parquet.nanosAsLong"
        # lock: the conf window must not overlap another driver thread's
        # parquet schema resolution (the engine does run driver threads)
        with _EVENTS_CONF_LOCK:
            try:
                prev: str | None = spark.conf.get(_K)
            except Exception:  # noqa: BLE001 — unset has no default in 4.x
                prev = None
            spark.conf.set(_K, "true")
            try:
                df = spark.read.parquet(path)
                ts_type = dict(df.dtypes).get("ts")
                if ts_type == "bigint":
                    # FLOOR division (ts - pmod keeps exact int64): `div`
                    # truncates toward zero and would round pre-epoch
                    # nanos the wrong way
                    df = df.withColumn(
                        "ts",
                        F.timestamp_micros(
                            F.expr("(ts - pmod(ts, 1000)) div 1000")
                        ),
                    )
                elif ts_type == "timestamp_ntz":
                    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
                return _spread_scan(df, name, path) if spread else df
            finally:
                if prev is None:
                    spark.conf.unset(_K)
                else:
                    spark.conf.set(_K, prev)
    df = spark.read.parquet(path)
    return _spread_scan(df, name, path) if spread else df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register fixture tables as temp views so ``spark.sql`` works over them
    (the engine's user-facing SQL surface, replacing the reference's
    arbitrary-Cypher passthrough graphDB.py:106-112)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def export_table(df: DataFrame, path: str, fmt: str) -> None:
    """Write a fixture table as csv/json/orc/parquet — the sink half of
    connector breadth. CSV keeps a header; both text formats serialize
    timestamps as ISO-8601 so the round-trip is lossless at micros."""
    if fmt not in ("csv", "json", "orc", "parquet"):
        raise ValueError(f"unsupported export format {fmt!r}")
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    if fmt == "json":
        w = w.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    getattr(w, fmt)(path)


def load_table_from(
    spark: SparkSession, path: str, fmt: str, schema=None
) -> DataFrame:
    """Read a table from csv/json/orc/parquet with an ENFORCED schema.

    Text formats (csv/json) never infer at scale: inference is a full
    extra pass over 100 TB and can mis-type sparse columns per-partition.
    Callers pass the authoritative schema (e.g. the parquet fixture's
    ``df.schema``) so the scan is single-pass and bit-stable; orc/parquet
    carry their own schema. Malformed rows fail loudly (FAILFAST) rather
    than silently nulling."""
    if fmt in ("parquet", "orc"):
        return getattr(spark.read, fmt)(path)
    if fmt not in ("csv", "json"):
        raise ValueError(f"unsupported source format {fmt!r}")
    if schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema (no inference at scale)")
    r = spark.read.schema(schema).option("mode", "FAILFAST")
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    else:
        r = r.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    return getattr(r, fmt)(path)
