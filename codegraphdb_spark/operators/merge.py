"""Set-oriented merge/upsert operators (reference §2.B, graphDB.py:121-174).

The reference does per-record read-modify-write into Neo4j under a global
file lock (B1 add_node graphDB.py:121-131, lock graphDB.py:18-33). Here
every mutation is a deterministic merge job:

- B1/B2/B3 node upsert + label promotion → window last-wins with explicit
  priority (explicit kind beats 'none'; higher batch priority beats lower;
  ties broken by deterministic columns) — SURVEY §7.3(b).
- B4 endpoint synthesis → anti-join + union of 'none' placeholder rows
  (reference auto-creates missing endpoints, graphDB.py:133-153).
- B5 version delete → array_remove + empty-filter + edge cascade.
- B7 version stamping → anti-join + array_union, one vectorized job
  (reference loops nodes issuing point updates, update_version.py:21-44).
- B8 path-prefix normalize → single withColumn.

Scale: the merge shuffle partitions by full_name — the natural key — and
is the ONLY shuffle in the upsert path. No locks, no coordination;
idempotent (re-running the same batch yields the identical snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from codegraphdb_spark.datamodel import EDGES_SCHEMA, NODES_SCHEMA

_NODE_COLS = [f.name for f in NODES_SCHEMA.fields]
_EDGE_COLS = [f.name for f in EDGES_SCHEMA.fields]


def _node_priority_window():
    """THE node-merge priority window: explicit kind over 'none' (label
    promotion B3), then deterministic definition-site tie-breaks — never
    arrival order. One definition shared by merge_node_facts and
    sym_table_from_facts: the resolver's symbol table is only valid
    because its winning kind per full_name matches the merged node
    table's, so the two orderings must be THE SAME expression."""
    return Window.partitionBy("full_name").orderBy(
        F.when(F.col("kind") == "none", 1).otherwise(0),
        F.col("code_start").asc_nulls_last(),
        F.col("file_path").asc_nulls_last(),
        F.col("kind"),
    )


def merge_node_facts(node_facts: DataFrame, version: str) -> DataFrame:
    """B1: collapse raw node facts into one row per full_name.

    Priority: explicit kind over 'none' (label promotion B3), then
    deterministic tie-breaks (definition site) — never arrival order,
    which is what the reference implicitly relies on.
    """
    return (
        node_facts.withColumn("__rn", F.row_number().over(_node_priority_window()))
        .filter(F.col("__rn") == 1)
        .withColumn("versions", F.array(F.lit(version)))
        .select(*_NODE_COLS)
    )


def sym_table_from_facts(node_facts: DataFrame) -> DataFrame:
    """(full_name, kind) resolver symbol table straight from raw node
    facts — the SAME priority window as merge_node_facts (so the winning
    kind per full_name is identical) but none of the property columns.
    Extraction never emits placeholder kinds ('none' rows are synthesized
    only later, from edge endpoints), so this is exactly the validation
    surface base_resolution needs — and deriving it here breaks the
    checkpoint dependency between the merged node table and the resolution
    pass, letting the two materialize concurrently."""
    return (
        node_facts.withColumn("__rn", F.row_number().over(_node_priority_window()))
        .filter(F.col("__rn") == 1)
        .select("full_name", "kind")
    )


def merge_edge_facts(edge_facts: DataFrame, version: str) -> DataFrame:
    """B4 (dedupe part): one edge per (src, dst, rel_type); association_type
    keeps the first non-null deterministically. Accepts raw edge facts
    (FACTS_SCHEMA: full_name=src, kind=rel_type)."""
    edge_facts = edge_facts.select(
        F.col("full_name").alias("src"),
        F.col("dst"),
        F.col("kind").alias("rel_type"),
        F.col("association_type"),
    )
    w = Window.partitionBy("src", "dst", "rel_type").orderBy(
        F.col("association_type").asc_nulls_last()
    )
    return (
        edge_facts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn("versions", F.array(F.lit(version)))
        .select(*_EDGE_COLS)
    )


def synthesize_endpoints(nodes: DataFrame, edges: DataFrame, version: str) -> DataFrame:
    """B4: every edge endpoint must exist as a node; missing ones become
    'none'-kind placeholders (reference graphDB.py:72-80: nodes first seen
    as endpoints get label 'none', promoted later)."""
    endpoints = (
        edges.select(F.col("src").alias("full_name"))
        .unionByName(edges.select(F.col("dst").alias("full_name")))
        .distinct()
    )
    missing = endpoints.join(nodes, "full_name", "left_anti")
    placeholders = missing.select(
        "full_name",
        F.lit("none").alias("kind"),
        F.element_at(F.split("full_name", r"\."), -1).alias("name"),
        F.lit(None).cast("string").alias("file_path"),
        F.lit(None).cast("string").alias("class"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(None).cast("string").alias("code_file"),
        F.lit(None).cast("int").alias("code_start"),
        F.lit(None).cast("int").alias("code_end"),
        F.array(F.lit(version)).alias("versions"),
    )
    return nodes.unionByName(placeholders)


def stamp_version(
    nodes: DataFrame, new_version: str, change_list: list[str]
) -> DataFrame:
    """B7: copy-forward — add the new version to every node whose file_path
    EXISTS and is NOT in the change list (update_version.py:21-44:
    add_new_label_in_old_node stamps only real-file nodes), as one
    vectorized anti-membership + array_union (no per-row loop).

    Placeholder nodes (null file_path: 'none' endpoints, the UNSOLVED
    sentinel) are deliberately NOT stamped: recompiling the changed files
    regenerates every still-referenced placeholder in the new snapshot, so
    stamping them here would keep ghost placeholders alive in the new
    version after their referencing code was deleted."""
    unchanged = F.col("file_path").isNotNull() & ~F.col("file_path").isin(change_list)
    return nodes.withColumn(
        "versions",
        F.when(
            unchanged, F.array_union("versions", F.array(F.lit(new_version)))
        ).otherwise(F.col("versions")),
    )


def clear_version(
    nodes: DataFrame, edges: DataFrame, version: str
) -> tuple[DataFrame, DataFrame]:
    """B5: label-scoped delete (clear_task_data graphDB.py:94-100) —
    remove the version from every versions array, drop rows left empty,
    cascade edges whose endpoints vanished (DETACH semantics)."""
    n = nodes.withColumn("versions", F.array_remove("versions", version)).filter(
        F.size("versions") > 0
    )
    e = edges.withColumn("versions", F.array_remove("versions", version)).filter(
        F.size("versions") > 0
    )
    surviving = n.select("full_name")
    e = (
        e.join(surviving.withColumnRenamed("full_name", "src"), "src", "left_semi")
        .join(surviving.withColumnRenamed("full_name", "dst"), "dst", "left_semi")
    )
    return n, e


def merge_snapshots(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """Version-aware snapshot merge (the F3 incremental path): full outer on
    the key — rows only in old keep their versions; rows only in new enter
    as-is; rows in both take the NEW properties and the UNION of versions
    (reference: re-indexed nodes get the new task label added on the same
    Neo4j node, update_version.py + graphDB.py:121-131)."""
    o = old.select(
        *[F.col(k) for k in keys],
        F.struct(*[c for c in old.columns if c not in keys]).alias("__old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.struct(*[c for c in new.columns if c not in keys]).alias("__new"),
    )
    value_cols = [c for c in old.columns if c not in keys]
    joined = o.join(n, keys, "full_outer")
    out_cols = [F.col(k) for k in keys]
    for c in value_cols:
        if c == "versions":
            out_cols.append(
                F.when(
                    F.col("__old").isNotNull() & F.col("__new").isNotNull(),
                    F.array_union("__old.versions", "__new.versions"),
                )
                .otherwise(F.coalesce("__new.versions", "__old.versions"))
                .alias("versions")
            )
        else:
            out_cols.append(
                F.when(F.col("__new").isNotNull(), F.col(f"__new.{c}"))
                .otherwise(F.col(f"__old.{c}"))
                .alias(c)
            )
    return joined.select(*out_cols)


def normalize_file_prefix(nodes: DataFrame, root: str) -> DataFrame:
    """B8: strip a root prefix from file_path in bulk (graphDB.py:155-174)."""
    import re

    pre = root if root.endswith("/") else root + "/"
    out = nodes.withColumn(
        "file_path", F.regexp_replace("file_path", "^" + re.escape(pre), "")
    )
    if "code_file" in nodes.columns:
        # the extractor sets code_file to the SAME path — leaving it
        # un-stripped would break code hydration (hydrate_code joins
        # code_file against the repo-relative files.path) and diverge
        # from change-list matching on file_path
        out = out.withColumn(
            "code_file", F.regexp_replace("code_file", "^" + re.escape(pre), "")
        )
    return out
