"""CLI — the engine's equivalent of the reference's entrypoints.

    python -m codegraphdb_spark build  <repo_dir> <snapshot_dir> [--version v1]
    python -m codegraphdb_spark update <repo_dir> <snapshot_dir> --old v1 --new v2 \
            --changed path/a.py [--changed path/b.py ...]
    python -m codegraphdb_spark query  <snapshot_dir> "<cypher-or-sql>" [--limit N]

Mirrors: whole-repo index (run_mutiprocess.py:107-121), incremental update
(update_version.py:77-100), interactive query with <CODE>-style results
(graphDB.py:259-277). Queries starting with MATCH go through the
Cypher-subset compiler; anything else is Spark SQL over the registered
``nodes``/``edges`` views.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="codegraphdb_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="index a repo into a graph snapshot")
    b.add_argument("repo_dir")
    b.add_argument("snapshot_dir")
    b.add_argument("--version", default="v1")

    u = sub.add_parser("update", help="incremental re-index of changed files")
    u.add_argument("repo_dir")
    u.add_argument("snapshot_dir")
    u.add_argument("--old", required=True)
    u.add_argument("--new", required=True)
    u.add_argument("--changed", action="append", required=True)

    q = sub.add_parser("query", help="run Cypher-subset or SQL over a snapshot")
    q.add_argument("snapshot_dir")
    q.add_argument("query_text")
    q.add_argument("--limit", type=int, default=50)

    st = sub.add_parser(
        "stream",
        help="watch a directory; index newly arriving *.py files, one "
        "graph version per micro-batch (streaming/repo_index.py)",
    )
    st.add_argument("watch_dir")
    st.add_argument("snapshot_dir")
    st.add_argument("checkpoint_dir")
    st.add_argument("--prefix", default="s")
    st.add_argument("--max-files-per-trigger", type=int, default=None)
    st.add_argument(
        "--incremental",
        action="store_true",
        help="persist via the manifest snapshot (O(affected buckets) disk "
        "traffic per batch instead of a full rewrite; see "
        "streaming/repo_index.index_batch for the atomicity trade)",
    )
    st.add_argument(
        "--drain",
        action="store_true",
        help="process the current backlog (availableNow) and exit instead "
        "of running continuously",
    )

    args = ap.parse_args(argv)

    from codegraphdb_spark.engine import GraphEngine
    from codegraphdb_spark.session import get_spark

    spark = get_spark("codegraphdb-cli")
    spark.sparkContext.setLogLevel("ERROR")
    eng = GraphEngine(spark)

    if args.cmd == "build":
        from codegraphdb_spark.sources.repo import scan_repo

        # absolute path REQUIRED for path relativization: input_file_name
        # returns fully-qualified URIs, so a relative repo_dir would strip
        # nothing and module names would be derived from absolute paths
        files = scan_repo(spark, os.path.abspath(args.repo_dir))
        nodes, edges, facts = eng.build(files, args.version)
        eng.write_snapshot(nodes, edges, args.snapshot_dir, atomic=True)
        # staged facts swap — same crash-safety as the snapshot tables
        from codegraphdb_spark.engine import safe_table_swap
        from codegraphdb_spark.streaming.repo_index import _hadoop_fs

        facts_dst = f"{args.snapshot_dir}/facts_{args.version}"
        facts_stage = facts_dst + ".stage"
        facts.write.mode("overwrite").parquet(facts_stage)
        fs, _ = _hadoop_fs(spark, facts_stage)
        safe_table_swap(fs, spark._jvm, facts_stage, facts_dst)
        n, e = nodes.count(), edges.count()
        print(f"built {args.version}: {n} nodes, {e} edges -> {args.snapshot_dir}")
        return 0

    if args.cmd == "update":
        from codegraphdb_spark.sources.repo import scan_repo

        from pyspark.sql import functions as F

        old_nodes, old_edges = eng.read_snapshot(args.snapshot_dir)
        old_facts = spark.read.parquet(f"{args.snapshot_dir}/facts_{args.old}")
        changed_files = scan_repo(spark, os.path.abspath(args.repo_dir)).filter(
            F.col("path").isin(args.changed)
        )
        # every --changed path must be on disk (a change) or in the old
        # facts (a deletion) — anything else is a typo/path-form mismatch
        # that would otherwise SILENTLY misindex (no fresh facts, and the
        # old ones dropped or left stale)
        on_disk = {r["path"] for r in changed_files.select("path").collect()}
        known_old = {
            r["file_path"]
            for r in old_facts.filter(F.col("file_path").isin(args.changed))
            .select("file_path")
            .distinct()
            .collect()
        }
        unknown = [c for c in args.changed if c not in on_disk and c not in known_old]
        if unknown:
            print(
                "error: --changed paths matched neither the scanned repo nor "
                f"the old snapshot (typo or non-repo-relative form?): {unknown}"
            )
            return 2
        # the dependency-pruned path: recompiles only the changed files +
        # their import-graph dependents (result-equal to a full recompile,
        # tests/test_incremental_pruned.py)
        nodes, edges, facts = eng.update_version_pruned(
            old_nodes, old_edges, old_facts, changed_files, args.changed, args.new
        )
        # materialize before overwriting the snapshot dirs we read from
        nodes = nodes.localCheckpoint(eager=True)
        edges = edges.localCheckpoint(eager=True)
        eng.write_snapshot(nodes, edges, args.snapshot_dir, atomic=True)
        # facts get the same staged swap: a crash mid-overwrite must not
        # pair the already-committed snapshot with a torn facts dir the
        # next `update --old` would silently misread
        from codegraphdb_spark.engine import safe_table_swap
        from codegraphdb_spark.streaming.repo_index import _hadoop_fs

        facts_dst = f"{args.snapshot_dir}/facts_{args.new}"
        facts_stage = facts_dst + ".stage"
        facts.write.mode("overwrite").parquet(facts_stage)
        fs, _ = _hadoop_fs(spark, facts_stage)
        safe_table_swap(fs, spark._jvm, facts_stage, facts_dst)
        print(f"updated {args.old} -> {args.new}: {nodes.count()} nodes")
        return 0

    if args.cmd == "stream":
        from codegraphdb_spark.streaming.repo_index import start_repo_indexer

        query = start_repo_indexer(
            spark,
            os.path.abspath(args.watch_dir),
            args.snapshot_dir,
            args.checkpoint_dir,
            version_prefix=args.prefix,
            max_files_per_trigger=args.max_files_per_trigger,
            available_now=args.drain,
            incremental=args.incremental,
        )
        query.awaitTermination()
        print(f"stream drained -> {args.snapshot_dir}" if args.drain else "stream stopped")
        return 0

    # query
    nodes, edges = eng.read_snapshot(args.snapshot_dir)
    text = args.query_text.strip()
    if text.upper().startswith("MATCH"):
        from codegraphdb_spark.plans.cypher import run_cypher

        df = run_cypher(text, nodes, edges)
    else:
        eng.register_views(nodes, edges)
        df = spark.sql(text)
    for row in df.limit(args.limit).collect():
        print(dict(row.asDict()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
