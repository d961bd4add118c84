"""Streaming incremental indexer (A8 × Structured Streaming): a file-source
stream of newly arrived ``*.py`` files drives the SAME incremental update
path the batch CLI uses, one graph version per micro-batch, via
``foreachBatch``.

Reference parity: the reference's incremental flow is poll-git-diff →
re-index changed files → stamp a new task label (update_version.py:21-68).
Here the arrival of files IS the trigger; each micro-batch runs
``GraphEngine.update_version`` (carried-forward facts + re-extract of the
batch only) and commits the snapshot, so readers always see a complete
versioned graph.

Implementation notes:
- The arrival stream is the ``binaryFile`` source: ONE ROW PER FILE
  (a per-line text source would also multiply rows per file). The stream
  is used purely as the arrival signal; ``index_batch`` re-reads the
  batch's paths wholetext in batch mode — idempotent on foreachBatch
  replay because content is read at process time, not enqueue time.
  INHERENT LIMITATION (all Spark file sources): zero-byte files are
  dropped at file-listing time and never fire an arrival. The event-bus
  deployment path (explicit URI list into ``index_batch``) does not have
  this hole — ``load_files`` restores empty files with empty content so
  an empty ``__init__.py`` still becomes its module node.
- All snapshot-existence probes go through the Hadoop FileSystem API, so
  a remote ``snapshot_dir`` (hdfs://, s3a://) takes the update branch
  like a local one (a driver-local os.path.exists would silently
  full-rebuild from each batch alone, destroying prior versions).
- The per-batch commit is STAGED: nodes/edges/facts are written to a
  ``.stage`` directory and swapped in with three metadata renames, so
  the long Spark writes never expose a mixed-version snapshot. The
  rename sequence itself is not one atomic transaction — a crash between
  renames can still mix versions for that window; a table format with
  real transactions (Delta/Iceberg) is the production answer, this keeps
  the exposure to milliseconds instead of the whole write.

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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from codegraphdb_spark.engine import GraphEngine
from codegraphdb_spark.sources.repo import relative_path_col, uri_to_relative

FACTS_DIRNAME = "facts"


def _facts_path(snapshot_dir: str) -> str:
    return os.path.join(snapshot_dir, FACTS_DIRNAME)


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence probe (os.path.exists is wrong for
    any non-local snapshot_dir and would full-rebuild every batch)."""
    fs, hpath = _hadoop_fs(spark, path)
    return fs.exists(hpath)


def _latest_cli_facts(spark: SparkSession, snapshot_dir: str) -> str | None:
    """Newest ``facts_<version>`` directory (the batch CLI's layout,
    __main__.py) — lets the stream take over a CLI-bootstrapped snapshot
    instead of crashing on the missing streaming-layout ``facts`` dir."""
    fs, base = _hadoop_fs(spark, snapshot_dir)
    glob = spark._jvm.org.apache.hadoop.fs.Path(snapshot_dir + "/facts_*")
    statuses = fs.globStatus(glob)
    if not statuses:
        return None
    best = max(statuses, key=lambda st: st.getModificationTime())
    return best.getPath().toString()


# read-side manifest folds before an automatic atomic re-base: each
# write_snapshot_update adds one conditional-array_union layer to every
# subsequent read plan, so a long-running stream must periodically compact
# (write_snapshot_incremental_base) or its per-batch read plan grows
# without bound
SNAPSHOT_REBASE_MANIFEST_LEN = 24


def _is_manifest_layout(spark: SparkSession, snapshot_dir: str) -> bool:
    """True if the on-disk snapshot uses the incremental (manifest) layout —
    detected by the fb= second-level partition dirs under nodes, not by the
    _manifest file (a fresh incremental base write has no manifest yet)."""
    fs, _ = _hadoop_fs(spark, snapshot_dir)
    for pat in ("fb=*", "*/fb=*"):  # fb-only layout; legacy (kind, fb)
        glob = spark._jvm.org.apache.hadoop.fs.Path(
            os.path.join(snapshot_dir, "nodes", pat)
        )
        if fs.globStatus(glob):
            return True
    return False


def read_arrivals_stream(
    spark: SparkSession, watch_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Newly arrived ``*.py`` files under ``watch_dir`` as a streaming
    frame of file URIs — binaryFile source: one row per FILE (zero-byte
    files never fire: Spark drops them at listing time; see module
    docstring)."""
    reader = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is FIXED by the format, but streaming
        # sources require it stated explicitly
        .schema(
            "path STRING, modificationTime TIMESTAMP, "
            "length BIGINT, content BINARY"
        )
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.py")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(watch_dir).select(F.col("path").alias("uri"))


def load_files(spark: SparkSession, uris: list[str], watch_dir: str) -> DataFrame:
    """Batch wholetext read of specific file URIs → (path, content), the
    same frame shape — and the SAME path decoding — as
    sources/repo.scan_repo (relative_path_col is the single definition of
    that invariant). Zero-byte files produce NO row from the text reader
    (verified) — they are restored with empty content so an empty
    __init__.py still becomes a module node; the probe collect is bounded
    by the micro-batch size."""
    from codegraphdb_spark.sources.repo import files_from_pairs

    df = spark.read.text(uris, wholetext=True).select(
        relative_path_col(watch_dir).alias("path"),
        F.col("value").alias("content"),
    )
    expected = [uri_to_relative(u, watch_dir) for u in uris]
    found = {r["path"] for r in df.select("path").collect()}
    # Any path the reader produced that we did NOT expect means the
    # executor-side decode (relative_path_col) and the driver-side decode
    # (uri_to_relative) diverged on some URI — restoring the "missing"
    # driver-decoded twin below would then silently index the same file
    # twice (once real, once empty). Fail loudly instead.
    extra = found - set(expected)
    if extra:
        raise RuntimeError(
            "load_files path-decoder divergence: reader produced "
            f"unexpected paths {sorted(extra)[:5]} not in the expected set "
            "(relative_path_col vs uri_to_relative disagree)"
        )
    missing = [(p, "") for p in expected if p not in found]
    if missing:
        df = df.unionByName(files_from_pairs(spark, missing))
    return df


def _staged_commit(
    spark: SparkSession,
    eng: GraphEngine,
    nodes: DataFrame,
    edges: DataFrame,
    facts: DataFrame,
    snapshot_dir: str,
) -> None:
    """Write the three snapshot tables to a .stage dir, then swap them in
    with metadata renames — readers and replay never see a snapshot whose
    nodes and edges come from different versions because a long write died
    in the middle."""
    from codegraphdb_spark.engine import safe_table_swap

    stage = snapshot_dir.rstrip("/") + ".stage"
    fs, stage_path = _hadoop_fs(spark, stage)
    fs.delete(stage_path, True)
    eng.write_snapshot(nodes, edges, stage)
    facts.write.mode("overwrite").parquet(_facts_path(stage))
    # rename requires the destination parent to exist on some filesystems
    fs.mkdirs(spark._jvm.org.apache.hadoop.fs.Path(snapshot_dir))
    for name in ("nodes", "edges", FACTS_DIRNAME):
        # checked old→trash→promote sequence: a false rename return can
        # never delete the only surviving copy (engine.safe_table_swap)
        safe_table_swap(
            fs, spark._jvm, f"{stage}/{name}", f"{snapshot_dir}/{name}"
        )
    fs.delete(stage_path, True)


def index_batch(
    spark: SparkSession,
    files: DataFrame,
    change_list: list[str],
    snapshot_dir: str,
    version: str,
    incremental: bool = False,
) -> None:
    """One indexing step: build if no usable snapshot exists yet, else the
    incremental update (re-extract THIS batch only, carry everything else
    forward). Factored out of the stream so event-bus deployments and
    tests drive it directly.

    Recovery/bootstrap ladder for the carried-facts input: streaming
    layout ``facts`` → the batch CLI's newest ``facts_<version>`` (a
    CLI-bootstrapped snapshot) → full build (also covers a batch-0 crash
    that died between the snapshot commit and nothing: replay rebuilds
    from the same batch instead of wedging on a missing facts dir).

    ``incremental=True`` switches persistence to the manifest snapshot
    (engine.write_snapshot_update): per batch the disk traffic is
    O(affected buckets) — the pruned recompile's affected cone for
    nodes/edges, the changed files' buckets for facts — instead of a
    full-corpus rewrite per micro-batch. The TRADE, stated plainly: the
    default staged-swap commit is torn-write-safe (readers never see
    mixed tables); dynamic partition overwrite is not cross-partition
    atomic, so a writer dying mid-batch can leave a torn update — replay
    of the same batch_id repairs it (versions merge idempotently), but a
    reader racing the crash window can observe it. The periodic atomic
    re-base is AUTOMATIC: once the manifest reaches
    SNAPSHOT_REBASE_MANIFEST_LEN entries the batch persists through
    write_snapshot_incremental_base instead (compacting the read-side fold
    and restoring a clean atomicity point). Equivalence of the two modes
    is pinned by tests/test_streaming_incremental_snapshot.py.

    Layout changes across batches are detected (fb= partition dirs under
    nodes) and MIGRATED through one full write of the requested mode —
    incremental=True over a staged snapshot base-writes the incremental
    layout; incremental=False over a manifest snapshot reads through the
    manifest fold, staged-swaps the flat tables, and drops the manifest —
    never a dynamic overwrite into a flat table or a fold-skipping read."""
    if not change_list:
        return
    eng = GraphEngine(spark, small_repo=True)
    facts_dir = _facts_path(snapshot_dir)
    old_facts = None
    if _fs_exists(spark, os.path.join(snapshot_dir, "nodes")):
        if _fs_exists(spark, facts_dir):
            old_facts = spark.read.parquet(facts_dir)
            if "fb" in old_facts.columns:
                old_facts = old_facts.drop("fb")
        else:
            cli_facts = _latest_cli_facts(spark, snapshot_dir)
            if cli_facts is not None:
                old_facts = spark.read.parquet(cli_facts)
    if old_facts is None:
        nodes, edges, facts = eng.build(files, version)
        nodes = nodes.localCheckpoint(eager=True)
        edges = edges.localCheckpoint(eager=True)
        if incremental:
            eng.write_snapshot_incremental_base(nodes, edges, snapshot_dir)
            eng.write_facts_incremental_base(facts, facts_dir)
        else:
            _staged_commit(spark, eng, nodes, edges, facts, snapshot_dir)
        return
    # layout guard: dynamic-overwriting fb= partition dirs into a staged
    # flat snapshot (or staged-swapping over a manifest layout without
    # reading it through the manifest fold) would leave mixed layouts /
    # stale version arrays — detect the on-disk layout FIRST and migrate
    # through a full write of the requested mode when they disagree
    manifest_layout = _is_manifest_layout(spark, snapshot_dir)
    if incremental:
        from codegraphdb_spark.operators.incremental import affected_files

        if manifest_layout:
            old_nodes, old_edges = eng.read_snapshot_incremental(snapshot_dir)
        else:
            old_nodes, old_edges = eng.read_snapshot(snapshot_dir)
        nodes, edges, facts2 = eng.update_version_pruned(
            old_nodes, old_edges, old_facts, files, change_list, version
        )
        nodes = nodes.localCheckpoint(eager=True)
        edges = edges.localCheckpoint(eager=True)
        if not manifest_layout:
            # migration from the staged layout: one full base write in the
            # incremental layout (static overwrite truncates the old flat
            # tables), O(affected) updates from the next batch on
            eng.write_snapshot_incremental_base(nodes, edges, snapshot_dir)
            eng.write_facts_incremental_base(facts2, facts_dir)
            return
        if len(eng._read_manifest(snapshot_dir)) >= SNAPSHOT_REBASE_MANIFEST_LEN:
            # periodic atomic re-base: compact the manifest fold out of
            # every subsequent read plan (and restore full-write atomicity
            # at this point in the stream)
            eng.write_snapshot_incremental_base(nodes, edges, snapshot_dir)
        else:
            aff = [
                r["file_path"]
                for r in affected_files(facts2, old_facts, change_list).collect()
            ]
            eng.write_snapshot_update(nodes, edges, snapshot_dir, version, aff)
        eng.write_facts_update(facts2, facts_dir, change_list)
        return
    if manifest_layout:
        old_nodes, old_edges = eng.read_snapshot_incremental(snapshot_dir)
    else:
        old_nodes, old_edges = eng.read_snapshot(snapshot_dir)
    nodes, edges, facts = eng.update_version(
        old_nodes, old_edges, old_facts, files, change_list, version
    )
    # materialize BEFORE the staged swap replaces the inputs they were
    # derived from (facts is already checkpointed inside build/update)
    nodes = nodes.localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    _staged_commit(spark, eng, nodes, edges, facts, snapshot_dir)
    if manifest_layout:
        # the staged swap replaced the tables wholesale with exact arrays;
        # a surviving manifest would double-apply its folds on a later
        # incremental read
        fs, mpath = _hadoop_fs(spark, os.path.join(snapshot_dir, "_manifest"))
        fs.delete(mpath, True)


def start_repo_indexer(
    spark: SparkSession,
    watch_dir: str,
    snapshot_dir: str,
    checkpoint_dir: str,
    version_prefix: str = "s",
    max_files_per_trigger: int | None = None,
    available_now: bool = False,
    incremental: bool = False,
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
        change_list = [uri_to_relative(u, watch_dir) for u in uris]
        index_batch(
            spark,
            files,
            change_list,
            snapshot_dir,
            f"{version_prefix}{batch_id}",
            incremental=incremental,
        )

    writer = stream.writeStream.foreachBatch(per_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
