"""SparkSession builder tuned for this engine.

Replaces the reference's Neo4j auto-start/connect-retry (graphDB.py:45-63)
with a SparkSession factory. Config notes for the 100 TB target:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast conversion replace any hand-tuned parallelism
  (reference hand-tunes ``max_workers`` in run_mutiprocess.py:70,82).
- ``spark.sql.shuffle.partitions`` is a local-mode default; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant as
  long as it is high enough (set ~2-3x total cores there).
- Arrow enabled: every Pandas UDF / mapInPandas path (AST extraction,
  multimodal decode) moves batches through Arrow, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "codegraphdb-spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    master = f"local[{cpus or DEFAULT_CPUS}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst=true (the Spark default) refuses to coalesce
        # post-shuffle partitions below defaultParallelism, so every
        # sub-MB shuffle still fans out to `cores` tasks — pure scheduling
        # overhead on small stages (guide §2.2: let AQE coalesce by size).
        # Env-overridable for A/B measurement; the advisory size (64m
        # default) governs the coalesced count at any scale.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_PARALLELISM_FIRST", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    # Optional warehouse isolation (static conf — must be set before the
    # session exists): tools that need a deterministic COLD standing-index
    # state (plan_pins) point this at a fresh temp dir so the persisted
    # tables under ./spark-warehouse can never leak into what they compute.
    wh = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if wh:
        builder = builder.config("spark.sql.warehouse.dir", wh)
    return builder.getOrCreate()


def clear_session_caches(spark) -> None:
    """Drop every module-level cached/checkpointed intermediate the query
    catalogs hold for this session, then clear Spark's own caches.

    The caches exist so a query FLEET shares expensive intermediates
    (pair overlap, LSH signatures, the built graph); but the held
    references pin localCheckpoint RDD blocks in the block manager, and a
    long session that has run the whole catalog carries hundreds of such
    blocks — enough heap pressure to slow later many-tiny-stage jobs
    several-fold (measured: the bench's pruned-update phase ran 8.9 s in
    a fresh session vs 66.9 s after 154 queries). Lifecycle phases that
    follow a query sweep should call this first."""
    from codegraphdb_spark.queries import graph, similarity, text

    for cache in (
        graph._CACHE,
        graph._FACTS_CACHE,
        graph._DEEP_CACHE,
        graph._PARITY_CACHE,  # holds a filter over the FULL combined e2
        # checkpoint since the r10 fold-in — a surviving entry would pin
        # the whole graph build's blocks across the clear
        similarity._EMB_PAIRS_CACHE,
        text._PAIRS_CACHE,
        text._CONTAINMENT_CACHE,
        text._SHSETS_CACHE,
        text._OVL_INDEX_CACHE,
        text._SPANS_CACHE,
        text._DUP_POS_CACHE,
        text._INC_BANDS_CACHE,
        text._LSH_CAND_CACHE,
        text._MH_SIGS_CACHE,
        text._SIM60_CACHE,
        similarity._INC_IVF_CACHE,
        similarity._FULL_CENT_CACHE,
        graph._CYCLE_FACTS_CACHE,
    ):
        cache.clear()
    spark.catalog.clearCache()
    import gc

    gc.collect()  # release checkpointed RDDs the cleared dicts referenced
