"""Plan-shape guards for the round-3 query paths: the properties that make
them scale are asserted on the physical plan, not just implied by the code.
"""

from __future__ import annotations

from codegraphdb_spark import registry


def _plan(spark, sf_dir, name):
    registry.load_all()
    df = registry.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_broadcasts_probe_grams(spark, sf_dir):
    """The probe n-gram set must be the BROADCAST side (benchmarks are
    small; the corpus streams past map-side) and the corpus scan must push
    the doc_id >= 5 split down to parquet."""
    plan = _plan(spark, sf_dir, "doc_decontaminate")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "GreaterThanOrEqual(doc_id,5)" in plan


def test_ann_single_signature_stage(spark, sf_dir):
    """probes_in_corpus=True: the corpus is bucketed ONCE — exactly one
    Arrow signature evaluation in the plan (the checkpointed bucket table
    serves both join sides), not one per side."""
    plan = _plan(spark, sf_dir, "emb_ann_topk")
    n_arrow = plan.count("ArrowEvalPython") + plan.count("MapInPandas")
    assert n_arrow <= 1, f"expected <=1 Python signature stage, saw {n_arrow}"


def test_near_dup_ships_vectors_once(spark, sf_dir):
    """Tile-local scoring: one FlatMapGroupsInPandas over the tiled
    embeddings, NO self-join of the vector table (the pair-join
    formulation shipped both vectors per candidate row). The only join
    allowed is the BROADCAST of per-block counts that sizes the tiling
    (tiny: one row per block); a SortMergeJoin would mean the corpus is
    joining itself."""
    plan = _plan(spark, sf_dir, "emb_near_dup_pairs")
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") <= 1


def test_repetition_filter_no_join(spark, sf_dir):
    """The word AND bigram statistics share one tagged explode: the plan
    must be two hash-aggregate chains with NO join (a join formulation
    would ship the document stats twice), and no Python stage at all."""
    plan = _plan(spark, sf_dir, "doc_repetition_filter")
    for op in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
               "CartesianProduct", "ArrowEvalPython", "MapInPandas",
               "BatchEvalPython"):
        assert op not in plan, f"unexpected {op} in doc_repetition_filter plan"
    assert plan.count("Exchange hashpartitioning") <= 2


def test_rollup_single_aggregate_pass(spark, sf_dir):
    """ROLLUP compiles to Expand + ONE hash-aggregate chain (partial +
    final) — a single shuffle, not a union of per-level scans."""
    plan = _plan(spark, sf_dir, "rollup_orders_report")
    assert "Expand" in plan
    assert plan.count("Scan parquet") == 1
    for op in ("SortMergeJoin", "BroadcastHashJoin", "Union"):
        assert op not in plan, f"unexpected {op} in rollup plan"


def test_chunk_windows_no_shuffle_before_explode(spark, sf_dir):
    """Chunking is map-local: explode + slice run in the scan stage; the
    only exchange is the presentation sort at the end. No Python stage."""
    plan = _plan(spark, sf_dir, "doc_chunk_windows")
    assert "Generate explode" in plan
    assert plan.count("Exchange hashpartitioning") == 0
    for op in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert op not in plan


def test_pack_sequences_one_window_shuffle(spark, sf_dir):
    """Packing = one hash exchange on source for the running-sum window,
    then the bin aggregate reuses that partitioning (no second shuffle
    keyed the same way is required map-side -> at most 2 exchanges
    total including the aggregate)."""
    plan = _plan(spark, sf_dir, "doc_pack_sequences")
    assert "Window" in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_dim_stats_partial_aggregation(spark, sf_dir):
    """The per-dimension moments must pre-aggregate map-side: shuffle rows
    = partitions x 64 dims, not corpus x 64. Assert a partial_ aggregate
    below the exchange."""
    plan = _plan(spark, sf_dir, "emb_dim_stats")
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    for op in ("ArrowEvalPython", "MapInPandas"):
        assert op not in plan


def test_cypher_grouped_is_one_aggregate(spark, sf_dir):
    """Implicit grouping compiles to a single hash-aggregate over the
    joined pattern — no extra shuffle beyond the aggregate's own and the
    pattern's joins (fixture side: everything is broadcast-small)."""
    plan = _plan(spark, sf_dir, "g_cypher_grouped")
    assert "HashAggregate" in plan or "SortAggregate" in plan
    assert "CartesianProduct" not in plan


def test_meta_extract_single_python_stage(spark, sf_dir):
    """Synthesis + real header parse run in ONE Arrow mapInPandas stage —
    no shuffle before it (the sort at the end is presentation only)."""
    plan = _plan(spark, sf_dir, "multimodal_meta_extract")
    n_py = plan.count("MapInPandas") + plan.count("ArrowEvalPython")
    assert n_py == 1, f"expected exactly 1 Python stage, saw {n_py}"
    assert plan.count("Exchange hashpartitioning") == 0


def test_gap_fill_grid_is_shuffle_lean(spark, sf_dir):
    """Grid build (distinct users + explode) and the daily aggregate +
    LOCF window: each shuffles on user-keyed partitions; no Python
    stages, no cartesian product."""
    plan = _plan(spark, sf_dir, "events_gap_fill_locf")
    assert "Generate explode" in plan
    for op in ("CartesianProduct", "MapInPandas", "ArrowEvalPython"):
        assert op not in plan
    assert "Window" in plan


def test_pq_topk_joins_codes_not_vectors(spark, sf_dir):
    """ADC scoring must join the probe distance TABLE against the codes —
    the raw embedding column must not appear past the encode stage (no
    zip_with/aggregate folds in the scoring plan)."""
    plan = _plan(spark, sf_dir, "emb_pq_topk")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "zip_with" not in plan and "aggregate(" not in plan
