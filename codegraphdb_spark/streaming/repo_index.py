"""Streaming incremental indexer (A8 × Structured Streaming): a file-source
stream of newly arrived ``*.py`` files drives the SAME incremental update
path the batch CLI uses, one graph version per micro-batch, via
``foreachBatch``.

Reference parity: the reference's incremental flow is poll-git-diff →
re-index changed files → stamp a new task label (update_version.py:21-68).
Here the arrival of files IS the trigger; each micro-batch runs
``GraphEngine.update_version`` (carried-forward facts + re-extract of the
batch only) and overwrites the snapshot, so readers always see a complete
versioned graph.

Implementation note: the streaming text source tracks ARRIVALS but ignores
``wholetext`` (rows are per-line), so the stream is used purely as the
file-arrival signal; ``index_batch`` re-reads the batch's paths wholetext
in batch mode — idempotent on foreachBatch replay because content is read
at process time, not enqueue time.

Semantics note (inherent to Spark file-stream sources): the source tracks
files BY PATH and is append-only — a modified file with an unchanged path
does not re-fire. A production deployment therefore streams (path,
content) change EVENTS (git webhook → Kafka/queue) into the same
``index_batch``; the foreachBatch body is identical, which is why it is
factored out and tested directly.

Scale notes: each micro-batch pays extraction only for the batch's files —
the carried-forward facts are a checkpointed snapshot-side table. The
per-batch merge is the same key-partitioned merge as the batch engine;
``maxFilesPerTrigger`` bounds batch size so update latency stays flat
regardless of backlog depth.
"""

from __future__ import annotations

import os
import re
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine

FACTS_DIRNAME = "facts"


def _facts_path(snapshot_dir: str) -> str:
    return os.path.join(snapshot_dir, FACTS_DIRNAME)


def read_arrivals_stream(
    spark: SparkSession, watch_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Newly arrived ``*.py`` files under ``watch_dir`` as a streaming
    frame of source-file URIs (one row per LINE — the streaming text
    source's granularity; consumers use the distinct ``uri`` only)."""
    reader = (
        spark.readStream.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.py")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.text(watch_dir).select(F.input_file_name().alias("uri"))


def _relative(uri: str, watch_dir: str) -> str:
    """file:// URI → watch-relative path, preserving literal '+'
    (unquote leaves '+' intact — the form-decoding pitfall of ADVICE r2
    does not apply here)."""
    path = unquote(uri)
    prefix = "file://" + (watch_dir if watch_dir.endswith("/") else watch_dir + "/")
    return path[len(prefix):] if path.startswith(prefix) else path


def load_files(spark: SparkSession, uris: list[str], watch_dir: str) -> DataFrame:
    """Batch wholetext read of specific file URIs → (path, content), the
    same frame shape as sources/repo.scan_repo."""
    df = spark.read.text(uris, wholetext=True)
    prefix = "file://" + (watch_dir if watch_dir.endswith("/") else watch_dir + "/")
    decoded = F.url_decode(F.regexp_replace(F.input_file_name(), r"\+", "%2B"))
    return df.select(
        F.regexp_replace(decoded, "^" + re.escape(prefix), "").alias("path"),
        F.col("value").alias("content"),
    )


def index_batch(
    spark: SparkSession,
    files: DataFrame,
    change_list: list[str],
    snapshot_dir: str,
    version: str,
) -> None:
    """One indexing step: build if no snapshot exists yet, else the
    incremental update (re-extract THIS batch only, carry everything else
    forward). Factored out of the stream so event-bus deployments and
    tests drive it directly."""
    if not change_list:
        return
    eng = GraphEngine(spark, small_repo=True)
    facts_dir = _facts_path(snapshot_dir)
    if not os.path.exists(os.path.join(snapshot_dir, "nodes")):
        nodes, edges, facts = eng.build(files, version)
    else:
        old_nodes, old_edges = eng.read_snapshot(snapshot_dir)
        old_facts = spark.read.parquet(facts_dir)
        nodes, edges, facts = eng.update_version(
            old_nodes, old_edges, old_facts, files, change_list, version
        )
    # materialize BEFORE overwriting the inputs they were derived from
    nodes = nodes.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    facts = facts.localCheckpoint(eager=True)
    eng.write_snapshot(nodes, edges, snapshot_dir)
    facts.write.mode("overwrite").parquet(facts_dir)


def start_repo_indexer(
    spark: SparkSession,
    watch_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    version_prefix: str = "s",
    max_files_per_trigger: int | None = None,
    available_now: bool = False,
):
    """Start the streaming indexer; returns the StreamingQuery. Versions
    are ``{prefix}{batch_id}`` — monotone, replay-stable (foreachBatch
    re-delivers the same batch_id on recovery, so a crashed batch
    re-merges idempotently instead of minting a new version)."""
    stream = read_arrivals_stream(spark, watch_dir, max_files_per_trigger)

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        uris = [r["uri"] for r in batch_df.select("uri").distinct().collect()]
        if not uris:
            return
        files = load_files(spark, uris, watch_dir)
        change_list = [_relative(u, watch_dir) for u in uris]
        index_batch(spark, files, change_list, snapshot_dir, f"{version_prefix}{batch_id}")

    writer = stream.writeStream.foreachBatch(per_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
