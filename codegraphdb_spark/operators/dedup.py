"""Deduplication operator APIs (SURVEY §2.H) — the reusable forms of the
oracle-checked queries in queries/text.py, returning keep/drop decisions
rather than diagnostics.

Pipeline shape at 100 TB:
  1. exact_dedup            — hash-groupBy, shuffles digests only;
  2. minhash_lsh_candidates — banded signatures → candidate pairs only;
  3. verify candidates with exact Jaccard (ngram_jaccard on the candidate
     semi-join, never all pairs);
  4. connected components over the duplicate-pair graph → keep one doc per
     component (union-find via iterative min-label propagation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CC_ITERATIONS = 30

# Hybrid threshold for duplicate_components, in PAIRS (edges). The
# duplicate-pair set is candidates-only by construction (banded LSH / IVF
# cells / label blocks upstream), so it is almost always tiny relative to
# the corpus; under this limit one Arrow collect + an exact driver
# union-find replaces O(diameter) join+agg+checkpoint rounds (~12+
# actions). Above it, the distributed min-label loop runs unchanged. Same
# stance and proven pattern as closure.DRIVER_CLOSURE_LIMIT.
# Sizing (r8): 1M pairs is ~16 MB over Arrow and ~300 MB of Python dicts
# for the union-find — comfortably inside the 16g driver; the K=100
# fixture's 273k pairs previously straddled the old 200k limit and paid
# ~12 distributed fixpoint actions for a graph the driver labels in ~2 s.
DRIVER_CC_LIMIT = 1_000_000


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One surviving row per distinct content hash (keep min id)."""
    keep = docs.groupBy(F.md5(text_col).alias("__h")).agg(
        F.min(id_col).alias(id_col)
    )
    return docs.join(keep, id_col, "left_semi")


def _driver_components(rows: list) -> list:
    """Exact union-find over collected (doc_a, doc_b) pairs; labels each
    vertex with the MIN id of its component (same contract as the
    distributed loop). Path-halving find + union by size. Returns
    (doc_id, component) tuples."""
    parent: dict = {}
    size: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for row in rows:
        for v in (row[0], row[1]):
            if v not in parent:
                parent[v] = v
                size[v] = 1
        ra, rb = find(row[0]), find(row[1])
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]

    comp_min: dict = {}
    for v in parent:
        r = find(v)
        m = comp_min.get(r)
        if m is None or v < m:
            comp_min[r] = v
    return [(v, comp_min[find(v)]) for v in parent]


def duplicate_components(
    pairs: DataFrame, force_distributed: bool = False
) -> DataFrame:
    """Connected components over duplicate pairs (doc_a, doc_b) →
    (doc_id, component) where component = min doc_id reachable.

    Hybrid strategy: the pair set is candidate pairs only (banded LSH /
    IVF buckets upstream), so under DRIVER_CC_LIMIT pairs an exact
    driver-side union-find (one limit-probed collect, one LocalTableScan
    back) replaces the iterative loop's ~12+ join+agg+checkpoint actions.
    Above the limit: iterative min-label propagation — the standard Spark
    union-find approximation; converges in O(diameter) rounds, each a
    join+agg. Dup clusters are tiny (near-identical docs), so the
    diameter is small.

    r8: the pair set is materialized ONCE up front. The old shape ran the
    candidate pipeline once for the limit probe and again for the edge
    build (measured: doc_dup_clusters at the K=100 fixture paid the full
    ~40 s pair computation twice); every downstream action — probe,
    driver collect, or fixpoint edges — now reads the checkpoint."""
    pairs = pairs.select("doc_a", "doc_b").localCheckpoint(eager=True)
    if not force_distributed:
        # Arrow collect (toPandas) — ~10x the Row-list collect at the
        # 1M-pair limit; the +1 row detects overflow without a count job
        probe = pairs.limit(DRIVER_CC_LIMIT + 1).toPandas()
        if len(probe) <= DRIVER_CC_LIMIT:
            spark = pairs.sparkSession
            from pyspark.sql.types import StructField, StructType

            id_type = pairs.schema["doc_a"].dataType
            schema = StructType(
                [
                    StructField("doc_id", id_type),
                    StructField("component", id_type),
                ]
            )
            labeled = _driver_components(
                list(zip(probe["doc_a"].tolist(), probe["doc_b"].tolist()))
            )
            if not labeled:
                return spark.createDataFrame([], schema)
            import pandas as pd

            # pandas input → JVM LocalTableScan (closure.py rationale: a
            # plain-list frame replans as a pickled-RDD scan per action)
            return spark.createDataFrame(
                pd.DataFrame(labeled, columns=["doc_id", "component"]),
                schema=schema,
            )
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # seed with min(self, direct neighbors) — one aggregation that does the
    # work of the first propagation round (every vertex appears as `a`
    # because edges are symmetrized)
    labels = (
        edges.groupBy(F.col("a").alias("doc_id"))
        .agg(F.min("b").alias("nbr_min"))
        .select("doc_id", F.least("doc_id", "nbr_min").alias("component"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(MAX_CC_ITERATIONS):
        neighbor_min = (
            edges.join(labels, edges.b == labels.doc_id)
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        # checkpoint BEFORE the convergence probe: the probe then reads two
        # materialized frames instead of re-running the join+agg
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        no_change = (
            updated.withColumnRenamed("component", "new_component")
            .join(labels, "doc_id")
            .filter(F.col("new_component") != F.col("component"))
            .isEmpty()
        )
        labels = updated
        if no_change:
            converged = True
            break
    if not converged:
        # a silent fall-out of the loop would return WRONG components (a
        # doc whose id is minimal within 30 hops but not its component
        # keeps itself as label and survives dedup) — fail loudly; a
        # cluster chain deeper than 30 means the threshold is admitting
        # non-duplicates or the propagation needs pointer doubling
        raise RuntimeError(
            f"duplicate_components did not converge in {MAX_CC_ITERATIONS} "
            "rounds — component diameter exceeds the cap"
        )
    return labels


def near_dedup_minhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_agreement: int = 8,
) -> DataFrame:
    """Full near-dedup: MinHash-LSH candidates (queries/text.py) filtered by
    signature agreement → connected components → keep the min-id doc per
    component. Returns the surviving rows of ``docs``."""
    from codegraphdb_spark.queries import text as tq

    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            F.array_distinct(tq._shingles(tq._tokens(text_col))), tq._h28
        ).alias("shs_h"),
    )
    # lazy checkpoint for the same reason as minhash_lsh_candidates: the
    # band self-join inside lsh_candidate_pairs references sigs twice
    sigs = sh.select(
        "doc_id", tq._minhash_sig(F.col("shs_h")).alias("sig")
    ).localCheckpoint(eager=False)
    dup_pairs = tq.lsh_candidate_pairs(sigs).filter(
        F.col("n_equal_minhash") >= min_agreement
    )
    comps = duplicate_components(dup_pairs.select("doc_a", "doc_b"))
    drop = comps.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(
        drop.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )
