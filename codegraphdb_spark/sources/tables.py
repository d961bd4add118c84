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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
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
                return df
            finally:
                if prev is None:
                    spark.conf.unset(_K)
                else:
                    spark.conf.set(_K, prev)
    return spark.read.parquet(path)


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
