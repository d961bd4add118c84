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
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    return builder.getOrCreate()
