"""Structured Streaming operators over event streams (SURVEY §2.H:
driver-mandated extension — the reference has no streaming surface, so
these are the engine's own capabilities, designed for unbounded input).

Every operator takes a STREAMING DataFrame (readStream source with an
``events``-shaped schema) and returns a streaming DataFrame ready for
``writeStream``. The batch twins in queries/events.py are oracle-checked;
these are exercised in tests/test_streaming.py with a file source +
``Trigger.AvailableNow`` + memory sink (deterministic replay).

Scale/state notes:
- watermarks bound state: windowed aggs evict windows older than the
  watermark; without one, state grows forever on an unbounded stream.
- session_window merges adjacent sessions in the state store — state per
  (user, open session), not per event.
- dropDuplicatesWithinWatermark keeps one fingerprint per key inside the
  watermark horizon — exactly-once-ish dedup with bounded memory.
- the custom stateful op uses applyInPandasWithState with an explicit
  processing-time timeout as the eviction policy (SURVEY §7.3(d):
  session_window first, custom state only when eviction is custom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WATERMARK = "30 minutes"

# RocksDB-backed state store (Spark bundles rocksdbjni): off-heap state,
# incremental (changelog) checkpoints — the production choice once state
# exceeds executor heap (millions of keys). The default HDFS-backed store
# keeps every key in JVM memory; fine for tests, not for 100 TB streams.
ROCKSDB_STATE_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    # write per-batch changelogs instead of full snapshots at every commit
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    # bound RocksDB native memory per executor instead of per-instance
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
}


def use_rocksdb_state(spark) -> dict[str, str | None]:
    """Switch the session's streaming state store to RocksDB. Returns the
    previous values so callers can restore them (state-store provider is
    read at query START, so set this before ``writeStream.start()``)."""
    prev: dict[str, str | None] = {}
    for k, v in ROCKSDB_STATE_CONF.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    return prev


def restore_state_conf(spark, prev: dict[str, str | None]) -> None:
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def tumbling_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Watermarked tumbling-window counts + value sums per event_type —
    the streaming twin of queries/events.py::events_tumbling_window."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Sliding-window aggregation (each event contributes to
    window/slide buckets)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
    )


def session_windows(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Native session windows (gap-based) per user — the streaming
    equivalent of the batch lag+cumsum sessionization."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(
    stream: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Drop duplicate (user_id, event_type) pairs arriving within the
    watermark horizon — bounded-state streaming dedup."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def running_user_totals(stream: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Custom stateful operator: per-user running event count + value total,
    emitted once per micro-batch per updated user (applyInPandasWithState).

    ``timeout_ms`` enables processing-time eviction for unbounded key
    spaces (long-running services). Leave None for drain-and-stop jobs:
    with a timeout configured, Trigger.AvailableNow keeps scheduling
    state-cleanup batches and never terminates.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"
    state_schema = "n BIGINT, total DOUBLE"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def read_events_stream(spark, source_dir: str, max_files_per_trigger: int | None = None):
    """File-based streaming source with the events schema (used by tests and
    as the template for real deployments — swap the path for a Kafka/files
    landing zone; the operator pipeline is identical)."""
    reader = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING"
        )
        .option("pathGlobFilter", "*.json")
    )
    if max_files_per_trigger is not None:
        # `is not None`, not truthiness: an explicit 0 should reach Spark
        # and fail loudly, not silently unthrottle the stream
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(source_dir)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str) -> None:
    """Drain a streaming DataFrame into a memory sink with AvailableNow
    (process everything currently available, then stop) — deterministic
    for tests."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def purchase_click_stream_join(
    purchases: DataFrame,
    clicks: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Stream-stream interval join: each purchase matched with the same
    user's clicks in the preceding ``max_gap``. Both sides carry watermarks
    so the join state is bounded — Spark evicts click state older than
    (watermark + gap) and purchase state older than the watermark. This is
    the streaming twin of the batch as-of/range joins (operators/asof.py,
    events_range_join)."""
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_gap}")),
        "inner",
    ).select("purchase_id", "click_id", F.col("p_user").alias("user_id"), "p_ts", "c_ts")


def ohlc_bars(
    stream: DataFrame,
    window: str = "1 day",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Watermarked OHLC downsampling bars — the streaming twin of
    queries/events.py::events_ohlc_bars. Streaming state can't hold a
    row_number sort, so open/close are declarative ``min_by``/``max_by``
    with the same unique (ts, event_id) tiebreak struct; state per
    (window × instrument) group is five scalars regardless of tick rate,
    and the watermark expires bars once their window is past — bounded
    state at any throughput."""
    key = F.struct("ts", "event_id")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        .select(
            F.col("window.start").alias("bar_day"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
        )
    )


def ewma_stream(stream: DataFrame, timeout_ms: int | None = None) -> DataFrame:
    """Streaming twin of queries/events.py::events_ewma — truncated EWMA
    (alpha = 1/2, 8 power-of-two lag weights) as a custom stateful
    operator. State per user is the last 7 scaled readings — O(horizon),
    never O(history) — which is exactly why the batch query's truncation
    matters: the same arithmetic becomes a bounded-state stream.

    ORDER CONTRACT: EWMA is order-SENSITIVE, so rows are event-time-sorted
    WITHIN each micro-batch (ts, event_id — the batch query's total
    order), but a reading that arrives in a later micro-batch than a
    younger sibling is smoothed in arrival order — the documented
    bounded-state tradeoff (reordering across batches would need unbounded
    buffering; use the batch query for post-hoc exactness). Under in-order
    replay the stream equals the batch result bit-for-bit
    (tests/test_streaming.py::test_ewma_stream_matches_batch_in_order).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "event_id BIGINT, user_id BIGINT, ts TIMESTAMP, ewma DOUBLE"
    state_schema = (
        "h0 BIGINT, h1 BIGINT, h2 BIGINT, h3 BIGINT, h4 BIGINT, h5 BIGINT, h6 BIGINT"
    )
    horizon = 8

    def update(key, pdfs, state: GroupState):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        # state.get returns the lag tuple newest-first; None = absent lag
        lags = list(state.get) if state.exists else [None] * (horizon - 1)
        rows = {"event_id": [], "user_id": [], "ts": [], "ewma": []}
        # pdfs is an ITERATOR of Arrow chunks (split at
        # maxRecordsPerBatch): sorting each chunk independently would
        # break the within-micro-batch event-time order for groups larger
        # than one chunk — concatenate FIRST, sort the whole batch once
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ev, ts, val in zip(whole["event_id"], whole["ts"], whole["value"]):
                # Spark's F.round = BigDecimal HALF_UP on the double's
                # exact binary expansion; Decimal(float) reproduces that
                # exactly (Python round() is HALF_EVEN and diverges on
                # exact halves)
                sv = int(
                    Decimal(float(val) * 1000000).quantize(
                        Decimal(1), rounding=ROUND_HALF_UP
                    )
                )
                window = [sv] + lags
                num = 0
                den = 0
                for i, v in enumerate(window):
                    if v is not None:
                        w = 1 << (horizon - 1 - i)
                        num += v * w
                        den += w
                rows["event_id"].append(int(ev))
                rows["user_id"].append(key[0])
                rows["ts"].append(ts)
                rows["ewma"].append(float(num) / float(den) / 1000000.0)
                lags = window[: horizon - 1]
        state.update(tuple(lags))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if rows["event_id"]:
            yield pd.DataFrame(rows)

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def cusum_reference_stats(events: DataFrame) -> dict[str, tuple[int, int]]:
    """Calibration for cusum_stream: per-type (mu_i, sigma_i) scaled
    integers from a STATIC calibration frame, with the exact expressions
    of the batch query (queries/events.py::events_cusum_drift) so the
    stream's recursion is bit-compatible with the batch windows."""
    from pyspark.sql import functions as F

    from codegraphdb_spark.queries.events import _CUSUM_SCALE

    sv = F.round(F.col("value") * _CUSUM_SCALE).cast("bigint")
    n = F.count(F.lit(1))
    s1 = F.sum(sv).cast("double")
    s2 = F.sum((sv * sv).cast("decimal(38,0)")).cast("double")
    rows = (
        events.groupBy("event_type")
        .agg(
            F.round(s1 / n).cast("bigint").alias("mu_i"),
            # same variance clamp as the batch query: a near-constant
            # type can round the subtraction a hair negative
            F.round(F.sqrt(F.greatest(s2 / n - (s1 / n) * (s1 / n), F.lit(0.0))))
            .cast("bigint")
            .alias("sigma_i"),
        )
        .collect()
    )
    return {r["event_type"]: (int(r["mu_i"]), int(r["sigma_i"])) for r in rows}


def cusum_stream(
    stream: DataFrame,
    ref: dict[str, tuple[int, int]],
    timeout_ms: int | None = None,
) -> DataFrame:
    """Streaming twin of queries/events.py::events_cusum_drift — the
    textbook two-sided CUSUM recursion S± = max(0, S± ± (d ∓ k)) as a
    custom stateful operator with O(1) state per event type (two
    integers), against REFERENCE statistics from a calibration window
    (``ref``: event_type → (mu_i, sigma_i) scaled ints, see
    cusum_reference_stats). This is the deployment shape of drift
    monitoring: calibrate once on a trusted window, stream the statistic
    forever with bounded state — the batch query's telescoped windows
    exist precisely because this recursion is not a SQL window.

    Event types absent from ``ref`` are DROPPED (no calibration → no
    monitoring; silently emitting unmonitored values as zeros would fake
    coverage). ORDER CONTRACT as ewma_stream: rows are event-time-sorted
    within each micro-batch; cross-batch stragglers are absorbed in
    arrival order (bounded state). Under in-order replay with ref taken
    from the same data, the stream equals the batch query bit-for-bit
    (tests/test_streaming.py::test_cusum_stream_matches_batch_in_order).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from codegraphdb_spark.queries.events import _CUSUM_SCALE

    out_schema = (
        "event_id BIGINT, event_type STRING, ts TIMESTAMP, "
        "cusum_pos DOUBLE, cusum_neg DOUBLE, drift_flag INT"
    )
    state_schema = "sp BIGINT, sn BIGINT"

    def update(key, pdfs, state: GroupState):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        typ = key[0]
        if typ not in ref:
            return  # uncalibrated type: dropped by contract
        mu_i, sigma_i = ref[typ]
        k = sigma_i // 2
        h = 8 * sigma_i
        sp, sn = state.get if state.exists else (0, 0)
        rows = {
            "event_id": [], "event_type": [], "ts": [],
            "cusum_pos": [], "cusum_neg": [], "drift_flag": [],
        }
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = pd.concat(chunks).sort_values(["ts", "event_id"])
            for ev, ts, val in zip(whole["event_id"], whole["ts"], whole["value"]):
                # same HALF_UP scaling as the batch query's F.round
                v = int(
                    Decimal(float(val) * _CUSUM_SCALE).quantize(
                        Decimal(1), rounding=ROUND_HALF_UP
                    )
                )
                d = v - mu_i
                sp = max(0, sp + d - k)
                sn = max(0, sn - d - k)
                rows["event_id"].append(int(ev))
                rows["event_type"].append(typ)
                rows["ts"].append(ts)
                rows["cusum_pos"].append(float(sp) / _CUSUM_SCALE)
                rows["cusum_neg"].append(float(sn) / _CUSUM_SCALE)
                rows["drift_flag"].append(1 if (sp > h or sn > h) else 0)
        state.update((sp, sn))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if rows["event_id"]:
            yield pd.DataFrame(rows)

    return stream.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
