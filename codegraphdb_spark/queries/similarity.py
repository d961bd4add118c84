"""Embedding similarity-search catalog over the ``embeddings`` fixture
(driver-mandated extension, SURVEY §2.H).

Exact brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant (``codegraphdb_spark.operators.similarity``) is the scale path —
random-hyperplane signatures bucket the corpus so a probe only scores its
bucket. Dot products run through exact DECIMAL accumulation (see
``_determinism``) so Spark and DuckDB emit bit-identical doubles regardless
of summation order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from codegraphdb_spark.registry import query
from codegraphdb_spark.sources.tables import load_table

DIM = 64
N_PROBES = 5
TOP_K = 10

# Dot products accumulate in scaled-integer space (round(x*y*1e12) → bigint
# sum): order-independent, exact, and — unlike double→decimal casts —
# bit-identical across engines (see _determinism.isum). 64 products of
# unit-scale floats × 1e12 stays far inside int64.
_SCALE = 1_000_000_000_000


def _ddot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: F.round(x * y * _SCALE).cast("bigint"))
    total = F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    return (total.cast("double") / _SCALE).cast("double")


def _sql_ddot(a: str, b: str) -> str:
    return (
        f"CAST(CAST(list_sum(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST(ROUND(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * {_SCALE}) AS BIGINT)"
        f")) AS DOUBLE) / {_SCALE} AS DOUBLE)"
    )


@query(
    "emb_cosine_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), probes AS (
      SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id < {N_PROBES}
    ), scored AS (
      SELECT p.probe_id, c.vec_id AS cand_id,
             {_sql_ddot('p.pe', 'c.e')} /
             (SQRT({_sql_ddot('p.pe', 'p.pe')}) * SQRT({_sql_ddot('c.e', 'c.e')})) AS cosine
      FROM probes p, v c
      WHERE c.vec_id <> p.probe_id
    )
    SELECT probe_id, cand_id, cosine,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY cosine DESC, cand_id) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    ORDER BY probe_id, rnk
    """,
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (tiny) probe set against the
    corpus — a broadcast nested-loop the executor side streams once, then a
    per-probe top-k window. At 100 TB you swap the probe×corpus product for
    the LSH-bucketed join; the scoring and ranking stages are identical."""
    # norms are precomputed ONCE per vector (not per pair): the corpus-side
    # norm is a scan-side projection and the probe-side norm rides the
    # broadcast — the pair stage then does ONE dot product per row instead
    # of three (bit-identical doubles: same sqrt(ddot) expression, computed
    # earlier in the plan)
    v = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    vn = v.withColumn("nrm", F.sqrt(_ddot(F.col("e"), F.col("e"))))
    probes = vn.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("e").alias("pe"),
        F.col("nrm").alias("pn"),
    )
    pairs = F.broadcast(probes).join(vn, F.col("vec_id") != F.col("probe_id"))
    cosine = _ddot(F.col("pe"), F.col("e")) / (F.col("pn") * F.col("nrm"))
    scored = pairs.select(
        "probe_id", F.col("vec_id").alias("cand_id"), cosine.alias("cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("probe_id", "rnk")
    )


@query(
    "emb_ann_topk",
    oracle=f"""
    WITH planes AS (
      SELECT t, b, i,
             ('0x' || substr(md5('plane:' || t || ':' || b || ':' || i), 1, 8))::UBIGINT
               / 2147483648.0 - 1.0 AS p
      FROM range(0, 4) r1(t), range(0, 8) r2(b), range(0, {DIM}) r3(i)
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), dots AS (
      SELECT v.vec_id, pl.t, pl.b,
             SUM(CAST(ROUND(v.e[pl.i + 1] * pl.p * {_SCALE}) AS BIGINT)) AS d
      FROM v, planes pl
      GROUP BY 1, 2, 3
    ), sigs AS (
      SELECT vec_id, t,
             CAST(SUM(CASE WHEN d >= 0 THEN 1 << b ELSE 0 END) AS INT) AS sig
      FROM dots GROUP BY 1, 2
    ), cand AS (
      SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
      FROM sigs p JOIN sigs c ON p.t = c.t AND p.sig = c.sig
      WHERE p.vec_id < {N_PROBES} AND c.vec_id <> p.vec_id
    ), scored AS (
      SELECT cand.probe_id, cand.cand_id,
             {_sql_ddot('pv.e', 'cv.e')} /
             (SQRT({_sql_ddot('pv.e', 'pv.e')}) * SQRT({_sql_ddot('cv.e', 'cv.e')})) AS score
      FROM cand
      JOIN v pv ON pv.vec_id = cand.probe_id
      JOIN v cv ON cv.vec_id = cand.cand_id
    )
    SELECT probe_id, cand_id, score, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY score DESC, cand_id) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    ORDER BY probe_id, rnk
    """,
)
def emb_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k — the 100 TB scale path for
    emb_cosine_topk, as a REAL hash-checked query (not just a recall test):
    the operator's hyperplanes are md5-derived (operators/similarity._plane)
    and its sign tests run in scaled-integer space, so the DuckDB oracle
    recomputes the SAME buckets from the same md5 bytes and the comparison
    is exact, not recall-bounded. Candidates = corpus rows sharing any
    (table, signature) bucket with the probe (4 tables × 8 bits); only
    those are scored. At 100 TB the corpus is bucketed once (parquet
    partitioned by table, sig) and each probe batch joins bucket-locally —
    probe cost is O(candidates), never O(corpus)."""
    from codegraphdb_spark.operators.similarity import ann_topk

    # norms precomputed once per vector, riding through the bucket
    # pipeline as extra columns (ann_topk passes them through to the
    # candidate rows) — the scorer then does ONE fold per pair
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    ).withColumn("nrm", F.sqrt(_ddot(F.col("vec"), F.col("vec"))))
    probes = v.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("vec").alias("pvec"),
        F.col("nrm").alias("pn"),
    )

    def exact_cosine(a: Column, b: Column) -> Column:
        return _ddot(a, b) / (F.col("pn") * F.col("nrm"))

    out = ann_topk(
        probes,
        v,
        dim=DIM,
        k=TOP_K,
        n_tables=4,
        n_bits=8,
        scorer=exact_cosine,
        probes_in_corpus=True,  # probes are corpus rows vec_id < N_PROBES
    )
    return out.select(
        "probe_id", "cand_id", "score", F.col("rnk").cast("int").alias("rnk")
    ).orderBy("probe_id", "rnk")


# Integer-embedding pair CTEs shared by the emb_near_dup_pairs oracle and
# _SQL_EMB_COMP (emb_dup_clusters / doc_semantic_dedup) — ONE definition so
# the rounding convention cannot drift between the family's oracles. The
# convention mirrors operators/similarity.tiled_block_pairs: components are
# rounded ONCE (ROUND(x·Q) → BIGINT) and cosine is a pure function of the
# integer vectors — Σ(qa·qb) / (√Σqa²·√Σqb²). Every sum ≤ dim·(Q·xmax)²
# < 2^53, so DuckDB's BIGINT sums cast to DOUBLE equal Spark's float64
# BLAS matmul bit-for-bit.
_PAIR_Q = 10_000_000  # == operators.similarity.PAIR_INT_SCALE

_SQL_INT_PAIR_CTES = f"""qv AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(ROUND(x * {_PAIR_Q}) AS BIGINT)) AS q
      FROM embeddings
    ), vn AS (
      SELECT vec_id, label, q,
             SQRT(CAST(list_sum(list_transform(q, x -> x * x)) AS DOUBLE)) AS nrm
      FROM qv
    ), pairs AS (
      SELECT * FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
               CAST(list_sum(list_transform(generate_series(1, {DIM}),
                      i -> a.q[i] * b.q[i])) AS DOUBLE) / (a.nrm * b.nrm) AS cosine
        FROM vn a JOIN vn b ON a.label = b.label AND a.vec_id < b.vec_id
      ) WHERE cosine >= 0.38
    )"""


@query(
    "emb_near_dup_pairs",
    oracle=f"""
    WITH {_SQL_INT_PAIR_CTES}
    SELECT vec_a, vec_b, CAST(label AS INT) AS label, cosine
    FROM pairs
    ORDER BY vec_a, vec_b
    """,
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with LABEL BLOCKING: only pairs
    sharing a label are scored (the blocking key stands in for an IVF/LSH
    bucket). The sub-quadratic path for corpora where even blocked
    all-pairs is unaffordable is banded candidates (operators/similarity
    .ann_topk); THIS query is the exact variant.

    Scoring runs through operators/similarity.tiled_block_pairs — the
    bounded-block kernel (VERDICT r5 item 2): blocks deeper than
    BLOCK_PAIR_CAP are hash-split into tiles so no task ever materializes
    a depth²-sized matrix (the r5 kernel built a (g, g, dim) rounded
    tensor — 2.4 GB at the sf1 fixture's 2,180-deep labels, a guaranteed
    OOM at 10× that). Arithmetic is input-rounded integers at Q=1e7: one
    float64 BLAS matmul per tile is EXACT (sums < 2^53) and bit-identical
    to the DuckDB oracle's integer list_sum — and runs ~100× faster than
    the per-element rounded product tensor it replaces."""
    from codegraphdb_spark.operators.similarity import tiled_block_pairs

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    out = tiled_block_pairs(
        v, block_col="label", id_col="vec_id", vec_col="e", threshold=0.38
    )
    return out.select(
        F.col("id_a").alias("vec_a"),
        F.col("id_b").alias("vec_b"),
        F.col("block").cast("int").alias("label"),
        "cosine",
    ).orderBy("vec_a", "vec_b")


@query(
    "emb_norm_stats",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    )
    SELECT vec_id, label,
           CAST(len(e) AS INT) AS dim,
           SQRT({_sql_ddot('e', 'e')}) AS l2_norm
    FROM v
    ORDER BY vec_id
    """,
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm + dimensionality — the cheap scan-side audit every
    embedding pipeline runs before indexing (catches zero/NaN vectors)."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    return v.select(
        "vec_id",
        "label",
        F.size("e").cast("int").alias("dim"),
        F.sqrt(_ddot(F.col("e"), F.col("e"))).alias("l2_norm"),
    ).orderBy("vec_id")



_IVF_SCALE = 1_000_000_000

# Coarse-distance quantum (r7): inputs round at Q and the distance is the
# exact integer Σ(round(x·Q) − round(c·Q))² — computable as ONE dgemm
# (||xq||² + ||cq||² − 2·xq·cq, every intermediate an integer < 2^53, so
# float64 BLAS is exact integer arithmetic; the tiled_block_pairs
# convention). The old per-element Σ ROUND((x−c)²·S) forced a
# memory-bound (g, cells, dim) difference tensor — cells grow with the
# corpus (per-label means), so at the K=100 fixture (200k vectors, 2000
# cells) that kernel was 8-12× slower AND its emit-all-cells contract
# OOMed the executor. Q=1e6 keeps |d| < 2^53 for |x| ≤ 2 at 64 dims; the
# kernel asserts the bound loudly.
_IVF_Q = 1_000_000

# the SQL twin of the kernel's distance, shared by every IVF-family
# oracle — one definition so the quantum and rounding can never drift
# between the SQL copies
def _sql_coarse_d(x: str = "e.x", c: str = "c.c") -> str:
    xq = f"CAST(ROUND({x} * {_IVF_Q}) AS BIGINT)"
    cq = f"CAST(ROUND({c} * {_IVF_Q}) AS BIGINT)"
    return f"SUM(({xq} - {cq}) * ({xq} - {cq}))"


# the coarse-quantizer CTE pair shared VERBATIM by every IVF-family oracle
# (assign / probed top-k / IVF-PQ): one definition so the scale constant
# and rounding can never drift between the SQL copies — the same rule
# _ivf_expl_cent enforces on the Spark side
_SQL_IVF_EXPL_CENT = f"""
    expl AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, (SELECT UNNEST(generate_series(1, {DIM})) AS i)
    ), cent AS (
      SELECT label AS clabel, pos,
             CAST(CAST(SUM(CAST(ROUND(x * {_IVF_SCALE}) AS BIGINT)) AS DOUBLE)
                  / COUNT(*) / {_IVF_SCALE} AS DOUBLE) AS c
      FROM expl GROUP BY label, pos
    )"""


_FULL_CENT_CACHE: dict = {}


def _standing_full_cent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL-corpus coarse quantizer as a persisted standing table —
    the same lifecycle treatment the frozen incremental quantizer already
    gets (_standing_ivf_tables): a production IVF materializes its
    centroids exactly once at indexing time. r10: previously every IVF
    family query (assign / probed top-k / Lloyd step / IVF-PQ) re-ran the
    centroid aggregation AND collected it to the driver at plan-build
    time — ~0.5–2s per query for identical k×dim rows (measured:
    emb_ivfpq_topk spent 2.35s before its first job). Values are
    bit-identical: the parquet round-trip of the exact same aggregation's
    doubles. Fingerprinted against the corpus + kernel params; a changed
    corpus or scale constant rebuilds."""
    key = (spark, sf_dir)
    if key not in _FULL_CENT_CACHE:
        import hashlib as _hl

        from codegraphdb_spark.operators.bucketing import (
            corpus_fingerprint,
            index_params_token,
            record_fingerprint,
            reuse_bucketed,
            write_bucketed,
        )
        from codegraphdb_spark.queries.graph import _evict_old

        tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
        name = f"ivf_cent_full_{tag}"
        fp = corpus_fingerprint(
            sf_dir,
            "embeddings",
            # hash the kernel source too (ADVICE r10): an edit to the
            # centroid arithmetic must flip the fingerprint, or a later
            # session would re-attach a stale persisted quantizer
            params=index_params_token(
                "ivf_cent_full/v1", _expl_cent_frames, _IVF_SCALE, DIM
            ),
        )
        t = reuse_bucketed(spark, name, fp, ["clabel"], 2, ["clabel", "pos"])
        if t is None:
            expl, cent = _expl_cent_frames(spark, sf_dir)
            write_bucketed(cent, name, ["clabel"], 2,
                           sort_cols=["clabel", "pos"])
            record_fingerprint(spark, name, fp, ["clabel"], 2)
            t = spark.table(name)
        _FULL_CENT_CACHE[key] = t
        _evict_old(_FULL_CENT_CACHE, keep=6)
    return _FULL_CENT_CACHE[key]


def _expl_cent_frames(spark: SparkSession, sf_dir: str):
    """The raw (expl, cent) frames — cent as the inline aggregation (the
    standing-table BUILD path and the one definition of the arithmetic)."""
    v = load_table(spark, sf_dir, "embeddings")
    expl = v.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x"),
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "x")
    cent = expl.groupBy(F.col("label").alias("clabel"), "pos").agg(
        (
            F.sum(F.round(F.col("x") * _IVF_SCALE).cast("bigint")).cast("double")
            / F.count(F.lit(1))
            / _IVF_SCALE
        ).alias("c")
    )
    return expl, cent


def _ivf_expl_cent(spark: SparkSession, sf_dir: str):
    """(expl, cent): per-(vector, pos) components and per-(label, pos)
    scaled-integer mean centroids — the shared first stage of the IVF
    family (assign / probed top-k / Lloyd step). ONE definition so the
    scale constant and rounding can never drift between the queries that
    claim to share the same cells. cent reads the standing quantizer
    table (bit-identical values, see _standing_full_cent)."""
    expl, _ = _expl_cent_frames(spark, sf_dir)
    return expl, _standing_full_cent(spark, sf_dir)


def _ivf_ranked(
    expl: DataFrame,
    cent: DataFrame,
    keep_label: bool = False,
    max_rn: int | None = None,
):
    """Scaled-int squared distances of every vector to every centroid,
    ranked per vector (rn=1 is the assignment; rn<=nprobe the probe
    cells). Same output contract and bit-identical arithmetic as the SQL
    oracles: d = Σ_pos (ROUND(x·Q) − ROUND(c·Q))² per (vector, cell),
    HALF_UP inputs at Q=_IVF_Q, exact integer sums, ties by (d, clabel)
    — the `_sql_coarse_d` twin is the one SQL definition every family
    oracle embeds.

    r6 shape: the exploded centroid JOIN generated N×dim×cells rows into
    the aggregate (128M at the 10× fixture once labels stopped being 10 —
    33 s wall); the centroid matrix is k×dim doubles — a coarse quantizer
    is ALWAYS a materialized artifact in a production IVF — so it is
    collected once per call and the distances run as a chunked numpy
    kernel over re-assembled vectors.

    r7 arithmetic: inputs round ONCE at Q (the tiled_block_pairs
    convention) so the distance decomposes into ||xq||² + ||cq||² −
    2·xq·cqᵀ — one float64 BLAS matmul per batch, exact integer
    arithmetic while every intermediate stays < 2^53 (loud assert). The
    old per-element Σ ROUND((x−c)²·S) could not decompose (rounding per
    (pos, cell)) and forced a memory-bound (g, cells, dim) tensor, 8-12×
    slower at the 2000-cell fixture.

    r7: ``max_rn`` bounds the EMISSION — every caller filters rn==1 or
    rn≤nprobe, yet the kernel emitted (and the topk queries
    checkpointed) all N×cells rows. Cells grow with the corpus (they are
    per-label means), so at the K=100 fixture that was 200k×2000 = 400M
    checkpointed rows — a measured executor OOM at 16g. With max_rn the
    kernel still scores every cell (the coarse-quantizer FLOPs are the
    honest assignment cost) but emits only each vector's top max_rn
    cells: N×nprobe rows cross the stage boundary, independent of cell
    count. None keeps the legacy emit-all contract."""
    import numpy as np
    import pandas as pd

    crows = cent.select("clabel", "pos", "c").collect()
    cells = sorted({r["clabel"] for r in crows})
    lbl = ", label INT" if keep_label else ""
    schema = f"vec_id BIGINT{lbl}, clabel INT, d BIGINT, rn INT"
    if not cells:
        # no centroids → no (vector, cell) rows, matching the old
        # aggregate-join formulation (an empty join side yields an empty
        # result) instead of a ZeroDivisionError in the chunk sizing
        return expl.sparkSession.createDataFrame([], schema)
    cell_idx = {cl: i for i, cl in enumerate(cells)}
    cmat = np.zeros((len(cells), DIM), dtype=np.float64)
    for r in crows:
        cmat[cell_idx[r["clabel"]], r["pos"] - 1] = r["c"]
    cell_arr = np.asarray(cells, dtype=np.int64)
    # input-rounding (the tiled_block_pairs convention): centroid
    # components quantize ONCE at Q; the distance then runs as one exact
    # integer dgemm per batch instead of a memory-bound (g, cells, dim)
    # difference tensor (measured 8-12x on the cells=2000 fixture)
    cq = np.trunc(cmat * _IVF_Q + np.copysign(0.5, cmat))  # HALF_UP
    # Exactness needs every INTERMEDIATE (||xq||², ||cq||², xq·cq) < 2^53,
    # not just the final d (ADVICE r7): a component bound of
    # sqrt(2^53/DIM) guarantees each dot-product term sum stays exact.
    in_bound = float(np.sqrt(2.0**53 / DIM))
    assert np.abs(cq).max() <= in_bound, (
        f"IVF quantized centroid component {np.abs(cq).max():.3e} > "
        f"sqrt(2^53/{DIM}); intermediates may lose bits — lower _IVF_Q"
    )
    cs = (cq * cq).sum(axis=1)  # (cells,) int-valued, < 2^53

    gcols = ["vec_id", "label"] if keep_label else ["vec_id"]
    vecs = expl.groupBy(*gcols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "x"))),
            lambda s: s["x"],
        ).alias("xs")
    )

    out_cols = gcols + ["clabel", "d", "rn"]

    # bound the (chunk, cells) distance matrix per step
    chunk = max(64, 8_000_000 // len(cells))

    def batches(it):
        for pdf in it:
            for s in range(0, len(pdf), chunk):
                sub = pdf.iloc[s : s + chunk]
                m = np.stack(sub["xs"].values)  # (g, dim)
                xq = np.trunc(m * _IVF_Q + np.copysign(0.5, m))  # HALF_UP
                assert np.abs(xq).max() <= in_bound, (
                    f"IVF quantized vector component {np.abs(xq).max():.3e}"
                    f" > sqrt(2^53/{DIM}) — lower _IVF_Q"
                )
                # ||xq-cq||^2 = ||xq||^2 + ||cq||^2 - 2 xq.cq — every
                # intermediate is an integer < 2^53, so the float64 BLAS
                # matmul is exact integer arithmetic (guard below is a
                # loud failure, never silent drift)
                d = (xq * xq).sum(axis=1)[:, None] + cs[None, :] - 2.0 * (
                    xq @ cq.T
                )  # (g, cells)
                assert np.abs(d).max() < 2**53, (
                    "IVF distance overflow: |d|max "
                    f"{np.abs(d).max():.3e} >= 2^53; lower _IVF_Q"
                )
                d = d.astype(np.int64)
                order = np.lexsort(
                    (np.broadcast_to(cell_arr, d.shape), d), axis=1
                )
                g, k = d.shape
                if max_rn is not None:
                    mm = min(max_rn, k)
                    idx = order[:, :mm]  # (g, mm): cells ranked 1..mm
                    out = {
                        c: np.repeat(sub[c].to_numpy(), mm) for c in gcols
                    }
                    out["clabel"] = cell_arr[idx].ravel()
                    out["d"] = np.take_along_axis(d, idx, axis=1).ravel()
                    out["rn"] = np.tile(
                        np.arange(1, mm + 1, dtype=np.int64), g
                    )
                    yield pd.DataFrame(out)[out_cols]
                    continue
                rn = np.empty_like(order)
                np.put_along_axis(
                    rn, order, np.arange(1, d.shape[1] + 1), axis=1
                )
                out = {c: np.repeat(sub[c].to_numpy(), k) for c in gcols}
                out["clabel"] = np.tile(cell_arr, g)
                out["d"] = d.ravel()
                out["rn"] = rn.ravel()
                yield pd.DataFrame(out)[out_cols]

    return vecs.mapInPandas(batches, schema=schema)


@query(
    "emb_ivf_assign",
    oracle=f"""
    WITH {_SQL_IVF_EXPL_CENT}, dists AS (
      SELECT e.vec_id, e.label, c.clabel,
             {_sql_coarse_d()} AS d
      FROM expl e JOIN cent c ON e.pos = c.pos
      GROUP BY e.vec_id, e.label, c.clabel
    )
    SELECT vec_id, label,
           CAST(clabel AS INT) AS assigned_label,
           CAST(d AS BIGINT) AS dist_scaled
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS rn
      FROM dists
    ) WHERE rn = 1
    ORDER BY vec_id
    """,
)
def emb_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    label-centroid by squared L2 (the inverted-file ANN scale path named in
    SURVEY §2.H — centroids from emb_centroid_by_label become the coarse
    index; probes then search only their nearest cells).

    Plan: centroids are k×dim rows (tiny → broadcast); the vector side
    explodes to (vec, pos) once and aggregates per (vec, centroid) — one
    shuffle, linear in corpus size, independent of corpus×corpus."""
    expl, cent = _ivf_expl_cent(spark, sf_dir)
    return (
        _ivf_ranked(expl, cent, keep_label=True, max_rn=1)
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "label",
            F.col("clabel").cast("int").alias("assigned_label"),
            F.col("d").cast("bigint").alias("dist_scaled"),
        )
        .orderBy("vec_id")
    )


_INC_IVF_CACHE: dict = {}


def _standing_ivf_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(inverted_file, centroids) as PERSISTED managed tables, built once
    per (session, sf_dir): the frozen coarse quantizer and the base
    corpus's cell assignments joined with their vectors, bucketed by cell
    (operators/bucketing.write_bucketed). This is the persisted
    inverted-file shape a production IVF maintains: the corpus is
    quantized exactly once at indexing time; each ingest batch quantizes
    only ITSELF against the frozen centroids and probes its own cell —
    the registered query's plan contains no corpus-side Python stage
    (VERDICT r5 item 6, plan-asserted)."""
    key = (spark, sf_dir)
    if key not in _INC_IVF_CACHE:
        import hashlib as _hl

        from codegraphdb_spark.operators.bucketing import (
            corpus_fingerprint,
            index_params_token,
            record_fingerprint,
            reuse_bucketed,
            write_bucketed,
        )
        from codegraphdb_spark.queries.graph import _evict_old

        tag0 = _hl.md5(sf_dir.encode()).hexdigest()[:8]
        fp = corpus_fingerprint(
            sf_dir,
            "embeddings",
            params=index_params_token(
                "inc_ivf/v1", _ivf_ranked, _IVF_SCALE, "base=vec_id%10!=0"
            ),
        )
        cent_r = reuse_bucketed(
            spark, f"inc_ivf_cent_{tag0}", fp, ["clabel"], 2,
            ["clabel", "pos"],
        )
        inv_r = reuse_bucketed(
            spark, f"inc_ivf_{tag0}", fp, ["clabel"], 8,
            ["clabel", "nn_vec_id"],
        )
        if cent_r is not None and inv_r is not None:
            _INC_IVF_CACHE[key] = (inv_r, cent_r)
            _evict_old(_INC_IVF_CACHE, keep=6)
            return _INC_IVF_CACHE[key]
        v = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
        )
        base = v.filter(F.col("vec_id") % 10 != 0)
        bexpl = base.select(
            "vec_id", "label", F.posexplode("e").alias("pos0", "x")
        ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "x")
        cent = bexpl.groupBy(F.col("label").alias("clabel"), "pos").agg(
            (
                F.sum(F.round(F.col("x") * _IVF_SCALE).cast("bigint")).cast("double")
                / F.count(F.lit(1))
                / _IVF_SCALE
            ).alias("c")
        )
        tag = _hl.md5(sf_dir.encode()).hexdigest()[:8]
        write_bucketed(cent, f"inc_ivf_cent_{tag}", ["clabel"], 2,
                       sort_cols=["clabel", "pos"])
        cent_t = spark.table(f"inc_ivf_cent_{tag}")
        inverted = (
            _ivf_ranked(bexpl, cent_t, max_rn=1)
            .filter(F.col("rn") == 1)
            .select(F.col("vec_id").alias("nn_vec_id"), "clabel")
            .join(base.select(F.col("vec_id").alias("nn_vec_id"), "e"), "nn_vec_id")
            .select("clabel", "nn_vec_id", "e")
        )
        write_bucketed(inverted, f"inc_ivf_{tag}", ["clabel"], 8,
                       sort_cols=["clabel", "nn_vec_id"])
        record_fingerprint(spark, f"inc_ivf_cent_{tag}", fp, ["clabel"], 2)
        record_fingerprint(spark, f"inc_ivf_{tag}", fp, ["clabel"], 8)
        _INC_IVF_CACHE[key] = (spark.table(f"inc_ivf_{tag}"), cent_t)
        _evict_old(_INC_IVF_CACHE, keep=6)
    return _INC_IVF_CACHE[key]


@query(
    "emb_incremental_ivf_probe",
    oracle=f"""
    WITH expl AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, (SELECT UNNEST(generate_series(1, {DIM})) AS i)
    ), bexpl AS (SELECT * FROM expl WHERE vec_id % 10 <> 0),
    dexpl AS (SELECT * FROM expl WHERE vec_id % 10 = 0),
    cent AS (
      SELECT label AS clabel, pos,
             CAST(CAST(SUM(CAST(ROUND(x * {_IVF_SCALE}) AS BIGINT)) AS DOUBLE)
                  / COUNT(*) / {_IVF_SCALE} AS DOUBLE) AS c
      FROM bexpl GROUP BY label, pos
    ),
    bd AS (
      SELECT e.vec_id, c.clabel,
             {_sql_coarse_d()} AS d
      FROM bexpl e JOIN cent c ON e.pos = c.pos GROUP BY e.vec_id, c.clabel
    ),
    bassign AS (
      SELECT vec_id, clabel FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS rn
        FROM bd) WHERE rn = 1
    ),
    dd AS (
      SELECT e.vec_id, c.clabel,
             {_sql_coarse_d()} AS d
      FROM dexpl e JOIN cent c ON e.pos = c.pos GROUP BY e.vec_id, c.clabel
    ),
    dassign AS (
      SELECT vec_id, clabel, d FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS rn
        FROM dd) WHERE rn = 1
    ),
    ve AS (SELECT vec_id, embedding AS e FROM embeddings),
    pairs AS (
      SELECT da.vec_id AS probe_id, da.clabel, da.d AS dist_scaled,
             ba.vec_id AS nn_vec_id,
             {_sql_ddot('pe.e', 'be.e')} /
             (SQRT({_sql_ddot('pe.e', 'pe.e')}) * SQRT({_sql_ddot('be.e', 'be.e')})) AS cosine
      FROM dassign da JOIN bassign ba ON da.clabel = ba.clabel
      JOIN ve pe ON pe.vec_id = da.vec_id
      JOIN ve be ON be.vec_id = ba.vec_id
    )
    SELECT probe_id, CAST(clabel AS INT) AS cell,
           CAST(dist_scaled AS BIGINT) AS dist_scaled,
           CAST(nn_vec_id AS BIGINT) AS nn_vec_id, cosine
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY probe_id ORDER BY cosine DESC, nn_vec_id) AS rn
          FROM pairs) WHERE rn = 1
    ORDER BY probe_id
    """,
)
def emb_incremental_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding twin of ingest-time dedup (minhash_incremental_candidates):
    a NEW batch of vectors (vec_id % 10 = 0) is quantized against the
    FROZEN coarse index — centroids computed from the BASE corpus only,
    the ingest reality (nobody retrains the quantizer per batch) — and
    each probe returns its cell plus the nearest base vector IN THAT CELL
    by exact scaled-int cosine. At 100 TB the base assignments are the
    persisted inverted file, partitioned by cell: per-ingest cost is
    |delta| × (k centroid distances + its own cell's occupancy), never
    corpus-wide. Same scaled-integer arithmetic as the rest of the IVF
    family (_IVF_SCALE / _SCALE), so cross-engine doubles match exactly;
    ties broken by cell id then base vec_id. RECOMPUTING oracle re-derives
    frozen centroids, both inverted files, and the cell-local rank."""
    inv, cent = _standing_ivf_tables(spark, sf_dir)
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    is_delta = F.col("vec_id") % 10 == 0
    dexpl = v.filter(is_delta).select(
        "vec_id", "label", F.posexplode("e").alias("pos0", "x")
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "x")
    delta_cell = (
        _ivf_ranked(dexpl, cent, max_rn=1)
        .filter(F.col("rn") == 1)
        .select(
            F.col("vec_id").alias("probe_id"),
            "clabel",
            F.col("d").cast("bigint").alias("dist_scaled"),
        )
    )
    # Cell-local scoring rides the SAME numpy block kernel shape as
    # emb_near_dup_pairs (bit-identical arithmetic to the declarative
    # _ddot form: per-element HALF_UP of x*y*_SCALE, exact int64 sum, two
    # IEEE divisions) — the interpreted zip_with/aggregate fold measured
    # 163 s vs 20 s at the 10× stress (tools/stress_ingest.py). Each cell's
    # probes and members cross Arrow ONCE; the probe×member product
    # tensor is chunked so batch memory stays bounded by cell design.
    import numpy as np
    import pandas as pd

    # base side comes STRAIGHT from the persisted inverted file — no
    # corpus-side quantization or join inside the registered query
    base_in = inv.select(
        "clabel",
        F.col("nn_vec_id").alias("vid"),
        "e",
        F.lit(False).alias("is_probe"),
        F.lit(None).cast("bigint").alias("dist_scaled"),
    )
    delta_in = delta_cell.join(
        v.select(F.col("vec_id").alias("probe_id"), "e"), "probe_id"
    ).select(
        "clabel",
        F.col("probe_id").alias("vid"),
        "e",
        F.lit(True).alias("is_probe"),
        "dist_scaled",
    )

    def score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        probes = pdf[pdf["is_probe"]].sort_values("vid").reset_index(drop=True)
        base = pdf[~pdf["is_probe"]].sort_values("vid").reset_index(drop=True)
        empty = pd.DataFrame(
            {"probe_id": [], "cell": [], "dist_scaled": [], "nn_vec_id": [],
             "cosine": []}
        ).astype(
            {"probe_id": "int64", "cell": "int32", "dist_scaled": "int64",
             "nn_vec_id": "int64", "cosine": "float64"}
        )
        if len(probes) == 0 or len(base) == 0:
            return empty

        def _half_up(x):
            return (x + np.copysign(0.5, x)).astype(np.int64)

        bm = np.stack(base["e"].values)  # (nb, D)
        bnrm = np.sqrt(_half_up(bm * bm * _SCALE).sum(axis=1) / _SCALE)
        bids = base["vid"].to_numpy()
        out = []
        for lo in range(0, len(probes), 64):  # chunk probes: bound temporaries
            pm = np.stack(probes["e"].values[lo : lo + 64])  # (np, D)
            pnrm = np.sqrt(_half_up(pm * pm * _SCALE).sum(axis=1) / _SCALE)
            dots = (
                _half_up(pm[:, None, :] * bm[None, :, :] * _SCALE).sum(axis=2)
                / _SCALE
            )
            cos = dots / (pnrm[:, None] * bnrm[None, :])
            # argmax = first occurrence; base sorted by vid, so ties break
            # toward the smallest nn_vec_id (ORDER BY cosine DESC, vid)
            best = cos.argmax(axis=1)
            rows = probes.iloc[lo : lo + 64]
            out.append(
                pd.DataFrame(
                    {
                        "probe_id": rows["vid"].to_numpy(),
                        "cell": np.int32(pdf["clabel"].iloc[0]),
                        "dist_scaled": rows["dist_scaled"].to_numpy(
                            dtype="int64"
                        ),
                        "nn_vec_id": bids[best],
                        "cosine": cos[np.arange(len(best)), best],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return (
        base_in.unionByName(delta_in)
        .groupBy("clabel")
        .applyInPandas(
            score_cell,
            schema="probe_id bigint, cell int, dist_scaled bigint, "
            "nn_vec_id bigint, cosine double",
        )
        .orderBy("probe_id")
    )


@query(
    "emb_centroid_by_label",
    oracle="""
    WITH expl AS (
      SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, (SELECT UNNEST(generate_series(1, 64)) AS i)
    )
    SELECT label, CAST(pos AS INT) AS pos,
           CAST(CAST(SUM(CAST(ROUND(x * 1000000000 ) AS BIGINT)) AS DOUBLE)
                / COUNT(*) / 1000000000 AS DOUBLE) AS centroid_val
    FROM expl
    GROUP BY label, pos
    ORDER BY label, pos
    """,
)
def emb_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, element-wise (posexplode → decimal-exact mean per
    (label, position)). This is the reduce side of k-means / IVF coarse
    quantizer training; partial aggregation keeps the shuffle at
    labels × dim rows, independent of corpus size."""
    v = load_table(spark, sf_dir, "embeddings")
    expl = v.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x")
    ).select("label", (F.col("pos0") + 1).cast("int").alias("pos"), "x")
    return (
        expl.groupBy("label", "pos")
        .agg(
            (
                F.sum(F.round(F.col("x") * 1_000_000_000).cast("bigint")).cast("double")
                / F.count(F.lit(1))
                / 1_000_000_000
            )
            .cast("double")
            .alias("centroid_val")
        )
        .orderBy("label", "pos")
    )


@query(
    "emb_int8_quantize",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), rng AS (
      SELECT vec_id, e,
             list_min(e) AS lo, list_max(e) AS hi
      FROM v
    ), q AS (
      SELECT vec_id, lo, hi,
             list_transform(generate_series(1, {DIM}),
               i -> CAST(ROUND((e[i] - lo) / (hi - lo) * 255.0) AS BIGINT)) AS codes,
             e
      FROM rng
    )
    SELECT vec_id,
           CAST(lo AS DOUBLE) AS lo, CAST(hi AS DOUBLE) AS hi,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           CAST(list_sum(list_transform(generate_series(1, {DIM}),
             i -> CAST(ROUND(ABS(e[i] - (lo + codes[i] * (hi - lo) / 255.0))
                             * 1000000000) AS BIGINT))) AS BIGINT) AS abs_err_scaled
    FROM q
    ORDER BY vec_id
    """,
)
def emb_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector uint8 scalar quantization (the standard 4x embedding
    compression for large corpora): min/max range -> 0..255 codes ->
    reconstruction-error audit. All arithmetic is double ops + integer
    rounding, bit-identical on both engines; at scale the codes column
    replaces the float array and distance kernels dequantize on the fly."""
    v = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    rng = v.select(
        "vec_id", "e", F.array_min("e").alias("lo"), F.array_max("e").alias("hi")
    )
    codes = F.transform(
        F.col("e"),
        lambda x: F.round((x - F.col("lo")) / (F.col("hi") - F.col("lo")) * 255.0).cast("bigint"),
    )
    q = rng.select("vec_id", "lo", "hi", "e", codes.alias("codes"))
    recon_err = F.aggregate(
        F.zip_with(
            F.col("e"),
            F.col("codes"),
            lambda x, c: F.round(
                F.abs(x - (F.col("lo") + c * (F.col("hi") - F.col("lo")) / 255.0))
                * 1_000_000_000
            ).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return q.select(
        "vec_id",
        F.col("lo").cast("double").alias("lo"),
        F.col("hi").cast("double").alias("hi"),
        F.aggregate(F.col("codes"), F.lit(0).cast("bigint"), lambda a, c: a + c)
        .cast("bigint")
        .alias("code_sum"),
        recon_err.cast("bigint").alias("abs_err_scaled"),
    ).orderBy("vec_id")

@query(
    "emb_kmeans_step",
    oracle=f"""
    WITH {_SQL_IVF_EXPL_CENT}, dists AS (
      SELECT e.vec_id, c.clabel,
             {_sql_coarse_d()} AS d
      FROM expl e JOIN cent c ON e.pos = c.pos
      GROUP BY e.vec_id, c.clabel
    ), assign AS (
      SELECT vec_id, clabel AS cluster
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY d, clabel) AS rn
            FROM dists) WHERE rn = 1
    )
    SELECT CAST(a.cluster AS INT) AS cluster, CAST(e.pos AS INT) AS pos,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(CAST(SUM(CAST(ROUND(e.x * 1000000000) AS BIGINT)) AS DOUBLE)
                / COUNT(*) / 1000000000 AS DOUBLE) AS new_centroid
    FROM expl e JOIN assign a ON e.vec_id = a.vec_id
    GROUP BY a.cluster, e.pos
    ORDER BY cluster, pos
    """,
)
def emb_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full k-means (Lloyd) iteration: assign every vector to its
    nearest current centroid (emb_ivf_assign's shape), then recompute
    centroids from the ASSIGNMENT — the iterate-until-stable pair, both
    halves value-checked. Scaled-int means keep every arithmetic step
    bit-identical across engines and partitionings (a raw double mean
    is shuffle-order-dependent). At 100 TB each iteration is two linear
    passes: one broadcast-join/agg to assign, one agg to update; only
    k×dim rows ever cross the cluster."""
    expl, cent = _ivf_expl_cent(spark, sf_dir)
    assign = (
        _ivf_ranked(expl, cent, max_rn=1)
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("clabel").alias("cluster"))
    )
    return (
        expl.join(assign, "vec_id")
        .groupBy("cluster", "pos")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (
                F.sum(F.round(F.col("x") * 1_000_000_000).cast("bigint")).cast("double")
                / F.count(F.lit(1))
                / 1_000_000_000
            )
            .cast("double")
            .alias("new_centroid"),
        )
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            F.col("pos").cast("int").alias("pos"),
            "n_members",
            "new_centroid",
        )
        .orderBy("cluster", "pos")
    )


_EMB_PAIRS_CACHE: dict = {}


def _near_dup_pairs_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup pair set, materialized once per (session, sf_dir) —
    same pattern as text._jaccard_pairs: the expensive intermediate a real
    dedup pipeline computes exactly once and fans out from."""
    # keyed on the session OBJECT (not id(): a freed wrapper's address can
    # be reused by a new session, silently returning a dead-session frame)
    key = (spark, sf_dir)
    if key not in _EMB_PAIRS_CACHE:
        from codegraphdb_spark.queries.graph import _evict_old

        _EMB_PAIRS_CACHE[key] = emb_near_dup_pairs(spark, sf_dir).localCheckpoint(
            eager=False
        )
        _evict_old(_EMB_PAIRS_CACHE, keep=6)  # (session, sf_dir) pairs
    return _EMB_PAIRS_CACHE[key]


# embedding near-dup connected components — shared by the emb_dup_clusters
# and doc_semantic_dedup oracles so the cluster definition cannot drift;
# pair semantics ride the SAME integer-cosine CTEs as emb_near_dup_pairs
_SQL_EMB_COMP = f"""{_SQL_INT_PAIR_CTES}, undirected AS (
      SELECT vec_a AS a, vec_b AS b FROM pairs
      UNION
      SELECT vec_b, vec_a FROM pairs
    ),
    reach(vec_id, lbl) AS (
      SELECT a, a FROM undirected
      UNION
      SELECT e.b, r.lbl FROM reach r JOIN undirected e ON e.a = r.vec_id
    ),
    comp AS (
      SELECT vec_id, MIN(lbl) AS component FROM reach GROUP BY vec_id
    )"""


@query(
    "emb_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_EMB_COMP}
    SELECT c.vec_id, CAST(c.component AS BIGINT) AS component, s.n_members
    FROM comp c
    JOIN (SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
          FROM comp GROUP BY component) s USING (component)
    ORDER BY c.vec_id
    """,
)
def emb_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-modality duplicate clusters: the SAME union-find operator
    (operators/dedup.duplicate_components — min-label propagation,
    checkpointed) over the cosine near-dup pair set, proving the dedup
    stack is modality-agnostic once candidates are pairs. The pair set is
    shared with emb_near_dup_pairs via a session cache, exactly like the
    text pipeline shares its Jaccard pairs.

    Scale shape: components run over PAIRS (tiny relative to the corpus);
    each iteration is one key-partitioned join+agg with truncated lineage
    — the corpus-sized scan happens once, in the candidate generator."""
    from codegraphdb_spark.operators.dedup import duplicate_components

    pairs = _near_dup_pairs_cached(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    comp = duplicate_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("doc_id").alias("vec_id"),
            F.col("component").cast("bigint").alias("component"),
            "n_members",
        )
        .orderBy("vec_id")
    )


@query(
    "doc_semantic_dedup",
    oracle=f"""
    WITH RECURSIVE {_SQL_EMB_COMP},
    sized AS (SELECT component, count(*) AS n_members FROM comp GROUP BY 1),
    j AS (
      SELECT c.component, d.doc_id, d.n_chars
      FROM comp c JOIN documents d ON d.doc_id = c.vec_id
    )
    SELECT CAST(w.component AS BIGINT) AS component,
           w.doc_id AS kept_doc,
           CAST(s.n_members AS BIGINT) AS n_members,
           CAST(s.n_members - 1 AS BIGINT) AS n_discarded,
           CAST(w.n_chars AS BIGINT) AS kept_chars
    FROM (SELECT *, row_number() OVER (PARTITION BY component
                                       ORDER BY n_chars DESC, doc_id) AS r
          FROM j) w
    JOIN sized s ON s.component = w.component
    WHERE w.r = 1 ORDER BY component
    """,
)
def doc_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cross-modal dedup: embedding-space near-dup clusters
    (the vec_id ↔ doc_id aligned emb_dup_clusters components) pick ONE
    surviving document each — the longest (n_chars DESC, doc_id tie-break)
    — and report the discard count. This is the semantic counterpart of
    doc_dedup_keep_best: the text pipeline dedupes lexical near-dups, this
    pass removes documents that SAY the same thing in different words.

    Scale: reuses the session-cached near-dup pair set and the same CC
    operator (pairs-sized, never corpus-sized); the survivor pick is one
    cluster-keyed window over one row per clustered doc."""
    clusters = emb_dup_clusters(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    j = clusters.join(docs, F.col("vec_id") == F.col("doc_id")).select(
        "component", "doc_id", "n_chars", "n_members"
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
    return (
        j.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            F.col("component").cast("bigint").alias("component"),
            F.col("doc_id").alias("kept_doc"),
            F.col("n_members").cast("bigint").alias("n_members"),
            (F.col("n_members") - 1).cast("bigint").alias("n_discarded"),
            F.col("n_chars").cast("bigint").alias("kept_chars"),
        )
        .orderBy("component")
    )


IVF_NPROBE = 2


@query(
    "emb_ivf_topk",
    oracle=f"""
    WITH {_SQL_IVF_EXPL_CENT}, dists AS (
      SELECT e.vec_id, c.clabel,
             {_sql_coarse_d()} AS d
      FROM expl e JOIN cent c ON e.pos = c.pos
      GROUP BY e.vec_id, c.clabel
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS rn
      FROM dists
    ), assigned AS (
      SELECT vec_id, clabel AS cell FROM ranked WHERE rn = 1
    ), pcells AS (
      SELECT vec_id AS probe_id, clabel AS cell FROM ranked
      WHERE vec_id < {N_PROBES} AND rn <= {IVF_NPROBE}
    ), v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             SQRT({_sql_ddot('embedding', 'embedding')}) AS nrm
      FROM embeddings
    ), scored AS (
      SELECT p.probe_id, a.vec_id AS cand_id,
             {_sql_ddot('pv.e', 'cv.e')} / (pv.nrm * cv.nrm) AS cosine
      FROM pcells p
      JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.probe_id
      JOIN v pv ON pv.vec_id = p.probe_id
      JOIN v cv ON cv.vec_id = a.vec_id
    )
    SELECT probe_id, cand_id, cosine, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY cosine DESC, cand_id) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    ORDER BY probe_id, rnk
    """,
)
def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed ANN top-k — the third ANN tier (brute force
    `emb_cosine_topk` → sign-LSH `emb_ann_topk` → inverted-file cells):
    corpus vectors are coarse-quantized ONCE to their nearest centroid
    (the emb_ivf_assign pass); each probe searches only its nprobe=2
    nearest cells. Exact hash-checked oracle — centroids and distances use
    the scaled-integer arithmetic, so DuckDB recomputes identical cells.

    Scale shape: assignment is one broadcast(k×dim centroids) join +
    per-vector argmin, linear in the corpus; the candidate join is an
    equi-join on cell id (bucket the inverted lists by cell at write time
    and it is shuffle-free); probe cost is O(candidates in nprobe cells),
    never O(corpus)."""
    v = load_table(spark, sf_dir, "embeddings")
    expl, cent = _ivf_expl_cent(spark, sf_dir)
    # ranked feeds two consumers (assignment + probe cells): truncate so
    # the distance kernel runs once; max_rn=nprobe bounds the checkpoint
    # at N×nprobe rows regardless of cell count (assignment uses rn==1)
    ranked = _ivf_ranked(expl, cent, max_rn=IVF_NPROBE).localCheckpoint(
        eager=False
    )
    assigned = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("cand_id"), F.col("clabel").alias("cell")
    )
    pcells = ranked.filter(
        (F.col("vec_id") < N_PROBES) & (F.col("rn") <= IVF_NPROBE)
    ).select(F.col("vec_id").alias("probe_id"), F.col("clabel").alias("cell"))
    vn = v.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    ).withColumn("nrm", F.sqrt(_ddot(F.col("e"), F.col("e"))))
    cands = F.broadcast(pcells).join(
        assigned, (assigned.cell == pcells.cell) & (F.col("cand_id") != F.col("probe_id"))
    ).select("probe_id", "cand_id")
    pv = vn.select(
        F.col("vec_id").alias("probe_id"),
        F.col("e").alias("pe"),
        F.col("nrm").alias("pn"),
    ).filter(F.col("probe_id") < N_PROBES)
    scored = (
        cands.join(F.broadcast(pv), "probe_id")
        .join(vn.withColumnRenamed("vec_id", "cand_id"), "cand_id")
        .select(
            "probe_id",
            "cand_id",
            (_ddot(F.col("pe"), F.col("e")) / (F.col("pn") * F.col("nrm"))).alias("cosine"),
        )
    )
    wk = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rnk", F.row_number().over(wk).cast("int"))
        .filter(F.col("rnk") <= TOP_K)
        .select("probe_id", "cand_id", "cosine", "rnk")
        .orderBy("probe_id", "rnk")
    )


# --- per-dimension corpus statistics (whitening / quantizer calibration) ------

_DSCALE = 1_000_000  # value-domain scale for exact per-dim moments


@query(
    "emb_dim_stats",
    oracle=f"""
    WITH x AS (
      SELECT i AS dim, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, (SELECT UNNEST(generate_series(1, {DIM})) AS i)
    )
    SELECT CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n_vals,
           CAST(CAST(SUM(CAST(ROUND(val * {_DSCALE}) AS BIGINT)) AS DOUBLE)
                / {_DSCALE} / COUNT(*) AS DOUBLE) AS mean_val,
           CAST(CAST(SUM(CAST(ROUND(val * {_DSCALE}) AS BIGINT)
                         * CAST(ROUND(val * {_DSCALE}) AS BIGINT)) AS DOUBLE)
                / {_DSCALE} / {_DSCALE} / COUNT(*)
                - (CAST(SUM(CAST(ROUND(val * {_DSCALE}) AS BIGINT)) AS DOUBLE)
                   / {_DSCALE} / COUNT(*))
                  * (CAST(SUM(CAST(ROUND(val * {_DSCALE}) AS BIGINT)) AS DOUBLE)
                     / {_DSCALE} / COUNT(*))
                AS DOUBLE) AS var_val,
           MIN(val) AS min_val,
           MAX(val) AS max_val
    FROM x
    GROUP BY dim
    ORDER BY dim
    """,
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus moments (mean/variance/min/max) — the
    calibration pass a whitening transform or scalar/product quantizer
    trains on. posexplode → ONE hash aggregate keyed by dim (64 keys):
    map-side combine reduces each partition to 64 partial rows, so the
    shuffle is O(partitions × dims) regardless of corpus size. Moments
    accumulate in scaled-integer space (exact, order-independent — see
    _determinism.isum); the final mean/variance divisions are single
    double ops, bit-identical across engines."""
    d = load_table(spark, sf_dir, "embeddings")
    x = d.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val")
    )
    sv = F.round(F.col("val") * _DSCALE).cast("bigint")
    s1 = F.sum(sv).cast("double")
    # sum of squares through DECIMAL(38,0): sv^2 fits int64 but the SUM
    # overflows past ~4e5 rows per dim at this scale; decimal sums are
    # exact and order-independent, and DuckDB's SUM(BIGINT) is already
    # int128 — both engines emit the identical double
    s2 = F.sum((sv * sv).cast("decimal(38,0)")).cast("double")
    n = F.count(F.lit(1))
    mean = (s1 / _DSCALE / n).cast("double")
    return (
        x.groupBy((F.col("pos") + 1).cast("int").alias("dim"))
        .agg(
            n.alias("n_vals"),
            mean.alias("mean_val"),
            (s2 / _DSCALE / _DSCALE / n - mean * mean).cast("double").alias("var_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("dim")
    )


@query(
    "emb_whiten",
    oracle=f"""
    WITH x AS (
      SELECT i AS dim, CAST(embedding[i] AS DOUBLE) AS val
      FROM embeddings, (SELECT UNNEST(generate_series(1, {DIM})) AS i)
    ), st AS (
      SELECT dim,
             CAST(SUM(CAST(ROUND(val * {_DSCALE}) AS BIGINT)) AS DOUBLE)
               / {_DSCALE} / COUNT(*) AS m,
             sqrt((CAST(SUM(CAST(ROUND(val * {_DSCALE}) AS BIGINT)
                            * CAST(ROUND(val * {_DSCALE}) AS BIGINT)) AS DOUBLE)
                    / {_DSCALE} / {_DSCALE} / COUNT(*)
                   - (CAST(SUM(CAST(ROUND(val * {_DSCALE}) AS BIGINT)) AS DOUBLE)
                      / {_DSCALE} / COUNT(*))
                     * (CAST(SUM(CAST(ROUND(val * {_DSCALE}) AS BIGINT)) AS DOUBLE)
                        / {_DSCALE} / COUNT(*))) + 1e-9) AS sd
      FROM x GROUP BY dim
    )
    SELECT v.vec_id, v.dim,
           (v.val - s.m) / s.sd AS whitened_val
    FROM (SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS val
          FROM embeddings, (SELECT UNNEST(generate_series(1, {DIM})) AS i)) v
    JOIN st s ON v.dim = s.dim
    ORDER BY v.vec_id, v.dim
    """,
)
def emb_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the whitening transform emb_dim_stats calibrates: per-dim
    standardization (x − mean)/sqrt(var + 1e-9). The stats aggregate is
    the same 64-key map-side-combined pass; the 64-entry parameter arrays
    broadcast as ONE row and the transform is map-side over the corpus —
    at 100 TB the corpus is touched once, nothing corpus-sized shuffles.
    Bit-exact across engines: moments accumulate in scaled-int space and
    every remaining op (−, /, sqrt, + 1e-9) is IEEE correctly-rounded, so
    identical inputs give identical doubles.

    Output is EXPLODED to one row per (vec_id, dim) with a scalar double
    column: top-level ARRAY columns are unhashable for the driver's pandas
    canonicalizer (the r5 lesson — same failure class as the r1
    grouped_collect_sorted fix at queries/relational.py:911), and scalar
    rows keep the oracle trivially alignable."""
    d = load_table(spark, sf_dir, "embeddings")
    x = d.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val"),
    )
    sv = F.round(F.col("val") * _DSCALE).cast("bigint")
    s1 = F.sum(sv).cast("double")
    # sum of squares through DECIMAL(38,0): sv^2 fits int64 but the SUM
    # overflows past ~4e5 rows per dim at this scale; decimal sums are
    # exact and order-independent, and DuckDB's SUM(BIGINT) is already
    # int128 — both engines emit the identical double
    s2 = F.sum((sv * sv).cast("decimal(38,0)")).cast("double")
    n = F.count(F.lit(1))
    mean = (s1 / _DSCALE / n).cast("double")
    st = x.groupBy(F.col("pos").alias("dim")).agg(
        mean.alias("m"),
        (s2 / _DSCALE / _DSCALE / n - mean * mean).cast("double").alias("v"),
    )
    params = st.agg(
        F.array_sort(F.collect_list(F.struct("dim", "m", "v"))).alias("a")
    ).select(
        F.transform(F.col("a"), lambda s: s["m"]).alias("means"),
        F.transform(F.col("a"), lambda s: F.sqrt(s["v"] + F.lit(1e-9))).alias("sds"),
    )
    emb = F.col("embedding").cast("array<double>")
    return (
        d.crossJoin(F.broadcast(params))
        .select(
            "vec_id",
            F.posexplode(
                F.transform(
                    emb,
                    lambda xv, i: (xv - F.element_at("means", i + 1))
                    / F.element_at("sds", i + 1),
                )
            ).alias("pos", "whitened_val"),
        )
        .select(
            "vec_id",
            (F.col("pos") + 1).cast("bigint").alias("dim"),
            "whitened_val",
        )
        .orderBy("vec_id", "dim")
    )


# --- product quantization: encode + ADC top-k (fourth ANN tier) ---------------

PQ_M = 8     # subspaces (DIM/PQ_M dims each)
PQ_K = 8     # centroids per subspace codebook
_PQ_SCALE = 1_000_000

_SQL_PQ_COMMON = f"""
    sx AS (
      SELECT vec_id,
             CAST((i - 1) // {DIM // PQ_M} AS INT) AS m,
             CAST((i - 1) % {DIM // PQ_M} AS INT) AS j,
             CAST(ROUND(CAST(embedding[i] AS DOUBLE) * {_PQ_SCALE}) AS BIGINT) AS sx
      FROM embeddings, (SELECT UNNEST(generate_series(1, {DIM})) AS i)
    ), cb AS (
      SELECT CAST(vec_id AS INT) AS k, m, j, sx AS c FROM sx WHERE vec_id < {PQ_K}
    ), subdist AS (
      SELECT s.vec_id, s.m, c.k, SUM((s.sx - c.c) * (s.sx - c.c)) AS d
      FROM sx s JOIN cb c ON s.m = c.m AND s.j = c.j
      GROUP BY s.vec_id, s.m, c.k
    ), coded AS (
      SELECT vec_id, m, k AS code, d,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
      FROM subdist
    )
"""


def _pq_coded(spark: SparkSession, sf_dir: str):
    """(subdist, coded) DataFrames: per-(vector, subspace) distances to the
    deterministic codebook (subvectors of vec_id < PQ_K) and the argmin
    code per subspace — all scaled-integer arithmetic, so the DuckDB
    oracle recomputes identical codes."""
    v = load_table(spark, sf_dir, "embeddings", spread=True)
    sub = DIM // PQ_M
    sx = v.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x"),
    ).select(
        "vec_id",
        (F.col("pos0") / sub).cast("int").alias("m"),
        (F.col("pos0") % sub).cast("int").alias("j"),
        F.round(F.col("x") * _PQ_SCALE).cast("bigint").alias("sx"),
    )
    cb = sx.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").cast("int").alias("k"), "m", "j", F.col("sx").alias("c")
    )
    subdist = (
        sx.join(F.broadcast(cb), ["m", "j"])
        .groupBy("vec_id", "m", "k")
        .agg(F.sum((F.col("sx") - F.col("c")) * (F.col("sx") - F.col("c"))).alias("d"))
    )
    w = Window.partitionBy("vec_id", "m").orderBy("d", "k")
    coded = (
        subdist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", F.col("k").alias("code"), "d")
    )
    return subdist, coded


@query(
    "emb_pq_encode",
    oracle=f"""
    WITH {_SQL_PQ_COMMON}
    SELECT vec_id,
           array_to_string(list(code ORDER BY m), ',') AS codes,
           CAST(SUM(d) AS BIGINT) AS recon_err
    FROM coded WHERE rn = 1
    GROUP BY vec_id ORDER BY vec_id
    """,
)
def emb_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encoding: each vector compresses to PQ_M
    one-byte codes (64 floats → 8 bytes, 32× smaller than float32) plus
    its exact reconstruction error. The codebook is deterministic (the
    subvectors of the first PQ_K vectors — refine it by composing
    emb_kmeans_step's Lloyd iteration per subspace); assignment is one
    broadcast join + per-(vector,subspace) argmin, linear in the corpus.
    At 100 TB the codes table is what you keep hot: ADC search
    (emb_pq_topk) touches only codes, never the raw vectors."""
    _, coded = _pq_coded(spark, sf_dir)
    return (
        coded.groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "code"))),
                    lambda s: s["code"].cast("string"),
                ),
                ",",
            ).alias("codes"),
            F.sum("d").cast("bigint").alias("recon_err"),
        )
        .orderBy("vec_id")
    )


@query(
    "emb_pq_topk",
    oracle=f"""
    WITH {_SQL_PQ_COMMON}, pd AS (
      SELECT vec_id AS probe_id, m, k, d FROM subdist WHERE vec_id < {N_PROBES}
    ), adc AS (
      SELECT pd.probe_id, e.vec_id AS cand_id, SUM(pd.d) AS dist
      FROM coded e
      JOIN pd ON pd.m = e.m AND pd.k = e.code
      WHERE e.rn = 1 AND e.vec_id <> pd.probe_id
      GROUP BY pd.probe_id, e.vec_id
    )
    SELECT probe_id, cand_id, CAST(dist AS BIGINT) AS adc_dist,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY dist, cand_id) AS rnk
      FROM adc
    ) WHERE rnk <= {TOP_K}
    ORDER BY probe_id, rnk
    """,
)
def emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC (asymmetric distance computation) top-k over the PQ codes — the
    fourth ANN tier (brute force → sign-LSH → IVF cells → PQ codes): each
    probe precomputes its distance TABLE to every subspace centroid
    (PQ_M × PQ_K integers), then every candidate's distance is PQ_M table
    lookups summed — no float math against raw vectors at query time.
    Exact oracle via the shared scaled-integer code path.

    Scale shape: the probe table is broadcast (M×K rows per probe); the
    candidate side streams the CODES table (8 bytes/vector); the argmin
    and top-k are the only shuffles. Compose with IVF cells (probe only
    nprobe cells' code lists) for the production configuration."""
    subdist, coded = _pq_coded(spark, sf_dir)
    pd = subdist.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "m", F.col("k").alias("code"),
        F.col("d").alias("pd"),
    )
    adc = (
        coded.join(F.broadcast(pd), ["m", "code"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("pd").alias("dist"))
    )
    wk = Window.partitionBy("probe_id").orderBy("dist", "cand_id")
    return (
        adc.withColumn("rnk", F.row_number().over(wk).cast("int"))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "probe_id", "cand_id", F.col("dist").cast("bigint").alias("adc_dist"), "rnk"
        )
        .orderBy("probe_id", "rnk")
    )


# --- IVF-PQ: product quantization over coarse-cell residuals (fifth tier) ----

_RES_SCALE = 1_000_000

_SQL_IVFPQ_COMMON = f"""
    {_SQL_IVF_EXPL_CENT}, cdists AS (
      SELECT e.vec_id, c.clabel,
             {_sql_coarse_d()} AS d
      FROM expl e JOIN cent c ON e.pos = c.pos
      GROUP BY e.vec_id, c.clabel
    ), cranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS crn
      FROM cdists
    ), assigned AS (
      SELECT vec_id, clabel AS cell FROM cranked WHERE crn = 1
    ), resid AS (
      SELECT e.vec_id,
             CAST((e.pos - 1) // {DIM // PQ_M} AS INT) AS m,
             CAST((e.pos - 1) % {DIM // PQ_M} AS INT) AS j,
             CAST(ROUND((e.x - c.c) * {_RES_SCALE}) AS BIGINT) AS rsx
      FROM expl e
      JOIN assigned a ON a.vec_id = e.vec_id
      JOIN cent c ON c.clabel = a.cell AND c.pos = e.pos
    ), rcb AS (
      SELECT CAST(vec_id AS INT) AS k, m, j, rsx AS cbv
      FROM resid WHERE vec_id < {PQ_K}
    ), rsubdist AS (
      SELECT r.vec_id, r.m, b.k,
             SUM((r.rsx - b.cbv) * (r.rsx - b.cbv)) AS d
      FROM resid r JOIN rcb b ON r.m = b.m AND r.j = b.j
      GROUP BY r.vec_id, r.m, b.k
    ), rcoded AS (
      SELECT vec_id, m, k AS code,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, k) AS rn
      FROM rsubdist
    ), pcells AS (
      SELECT vec_id AS probe_id, clabel AS cell FROM cranked
      WHERE vec_id < {N_PROBES} AND crn <= {IVF_NPROBE}
    ), presid AS (
      SELECT p.probe_id, p.cell,
             CAST((e.pos - 1) // {DIM // PQ_M} AS INT) AS m,
             CAST((e.pos - 1) % {DIM // PQ_M} AS INT) AS j,
             CAST(ROUND((e.x - c.c) * {_RES_SCALE}) AS BIGINT) AS prsx
      FROM pcells p
      JOIN expl e ON e.vec_id = p.probe_id
      JOIN cent c ON c.clabel = p.cell AND c.pos = e.pos
    ), ptab AS (
      SELECT pr.probe_id, pr.cell, pr.m, b.k,
             SUM((pr.prsx - b.cbv) * (pr.prsx - b.cbv)) AS d
      FROM presid pr JOIN rcb b ON pr.m = b.m AND pr.j = b.j
      GROUP BY pr.probe_id, pr.cell, pr.m, b.k
    ), adc AS (
      SELECT t.probe_id, e.vec_id AS cand_id, SUM(t.d) AS dist
      FROM rcoded e
      JOIN assigned a ON a.vec_id = e.vec_id
      JOIN ptab t ON t.cell = a.cell AND t.m = e.m AND t.k = e.code
      WHERE e.rn = 1 AND e.vec_id <> t.probe_id
      GROUP BY t.probe_id, e.vec_id
    )
"""


@query(
    "emb_ivfpq_topk",
    oracle=f"""
    WITH {_SQL_IVFPQ_COMMON}
    SELECT probe_id, cand_id, CAST(dist AS BIGINT) AS adc_dist,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY dist, cand_id) AS rnk
      FROM adc
    ) WHERE rnk <= {TOP_K}
    ORDER BY probe_id, rnk
    """,
)
def emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ADC top-k — the FIFTH ANN tier (brute force → sign-LSH →
    IVF cells → flat PQ → PQ over coarse-cell RESIDUALS). Residual
    encoding matters on clustered corpora: quantization error rivals
    within-cluster neighbor gaps for flat PQ, and the 100k-vector stress
    (tools/stress_pq.py) measured recall@10 0.345 → 0.555 at shortlist
    100 (0.970 → 0.985 at 1000) from exactly this change. Candidates come
    from the probe's IVF cells only; each candidate costs PQ_M table
    lookups over one-byte codes. All arithmetic is scaled-int on top of
    the IEEE-identical centroid doubles, so DuckDB recomputes the exact
    ADC ranks. Scale shape: centroids + residual codebook broadcast; the
    corpus is touched once to encode (codes = what stays hot at 100 TB);
    the ADC join shuffles probes × nprobe cells, never probes × corpus."""
    expl, cent = _ivf_expl_cent(spark, sf_dir)
    # ranked and resid each feed TWO consumers below (assignment + probe
    # cells; codebook + encoding) — truncate so the kernel/residual stages
    # run once, not once per consumer; max_rn=nprobe bounds the checkpoint
    # at N×nprobe rows regardless of cell count
    ranked = _ivf_ranked(expl, cent, max_rn=IVF_NPROBE).localCheckpoint(
        eager=False
    )
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vec_id", F.col("clabel").alias("cell")
    )
    sub = DIM // PQ_M
    centr = cent.select(
        F.col("clabel").alias("ccell"), F.col("pos").alias("cpos"), "c"
    )
    # NO broadcast hints on the tiny corpus-derived aggregates (VERDICT r5
    # item 5): each hint serializes the aggregate through the driver and
    # the measured sf1 default mode ran SLOWER than nobroadcast because of
    # exactly these; AQE sees the real post-shuffle sizes and broadcasts
    # when (and only when) it pays.
    resid = (
        expl.join(assigned, "vec_id")
        .join(
            centr,
            (F.col("ccell") == F.col("cell")) & (F.col("cpos") == F.col("pos")),
        )
        .select(
            "vec_id",
            ((F.col("pos") - 1) / sub).cast("int").alias("m"),
            ((F.col("pos") - 1) % sub).cast("int").alias("j"),
            F.round((F.col("x") - F.col("c")) * _RES_SCALE)
            .cast("bigint")
            .alias("rsx"),
        )
        .localCheckpoint(eager=False)
    )
    rcb = resid.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").cast("int").alias("k"), "m", "j", F.col("rsx").alias("cbv")
    )
    rsubdist = (
        resid.join(rcb, ["m", "j"])
        .groupBy("vec_id", "m", "k")
        .agg(
            F.sum((F.col("rsx") - F.col("cbv")) * (F.col("rsx") - F.col("cbv"))).alias(
                "d"
            )
        )
    )
    wm = Window.partitionBy("vec_id", "m").orderBy("d", "k")
    rcoded = (
        rsubdist.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", F.col("k").alias("code"))
    )
    pcells = ranked.filter(
        (F.col("vec_id") < N_PROBES) & (F.col("rn") <= IVF_NPROBE)
    ).select(F.col("vec_id").alias("probe_id"), F.col("clabel").alias("cell"))
    presid = (
        pcells.join(expl, pcells.probe_id == expl.vec_id)
        .join(
            centr,
            (F.col("ccell") == F.col("cell")) & (F.col("cpos") == F.col("pos")),
        )
        .select(
            "probe_id",
            "cell",
            ((F.col("pos") - 1) / sub).cast("int").alias("m"),
            ((F.col("pos") - 1) % sub).cast("int").alias("j"),
            F.round((F.col("x") - F.col("c")) * _RES_SCALE)
            .cast("bigint")
            .alias("prsx"),
        )
    )
    ptab = (
        presid.join(rcb, ["m", "j"])
        .groupBy("probe_id", "cell", "m", "k")
        .agg(
            F.sum(
                (F.col("prsx") - F.col("cbv")) * (F.col("prsx") - F.col("cbv"))
            ).alias("d")
        )
    )
    ptabr = ptab.select(
        "probe_id", F.col("cell").alias("pcell"), F.col("m").alias("pm"),
        "k", "d",
    )
    adc = (
        rcoded.join(assigned, "vec_id")
        .join(
            ptabr,
            (F.col("cell") == F.col("pcell"))
            & (F.col("m") == F.col("pm"))
            & (F.col("code") == F.col("k")),
        )
        .filter(F.col("vec_id") != F.col("probe_id"))
        .groupBy("probe_id", F.col("vec_id").alias("cand_id"))
        .agg(F.sum("d").alias("dist"))
    )
    wk = Window.partitionBy("probe_id").orderBy("dist", "cand_id")
    return (
        adc.withColumn("rnk", F.row_number().over(wk).cast("int"))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "probe_id",
            "cand_id",
            F.col("dist").cast("bigint").alias("adc_dist"),
            "rnk",
        )
        .orderBy("probe_id", "rnk")
    )


# --- MMR diversified retrieval ----------------------------------------------

MMR_POOL = 24   # relevance-ranked candidate pool fed to the re-ranker
MMR_K = 8       # diversified picks
# integer MMR weights: score = 7*rel - 3*max_sim (λ=0.7 scaled by 10) —
# relevance and diversity live in scaled-int inner-product space, so the
# greedy argmax is EXACT integer arithmetic on both engines (cosine-style
# double division would reintroduce the _half_up boundary class)
_MMR_REL_W, _MMR_DIV_W = 7, 3


def _idot(a: Column, b: Column) -> Column:
    """Scaled-integer dot product (the exact bigint _ddot divides down)."""
    prods = F.zip_with(a, b, lambda x, y: F.round(x * y * _SCALE).cast("bigint"))
    return F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def _sql_idot(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST(ROUND(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * {_SCALE}) AS BIGINT)"
        f")) AS BIGINT)"
    )


@query(
    "emb_mmr_diversify",
    oracle=f"""
    WITH RECURSIVE
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    probe AS (SELECT e AS pe FROM v WHERE vec_id = 0),
    rel AS (
      SELECT c.vec_id AS cand_id, {_sql_idot('probe.pe', 'c.e')} AS rel
      FROM v c, probe WHERE c.vec_id <> 0
      ORDER BY rel DESC, cand_id LIMIT {MMR_POOL}
    ),
    sims AS (
      SELECT a.cand_id AS a, b.cand_id AS b, {_sql_idot('va.e', 'vb.e')} AS sim
      FROM rel a JOIN v va ON va.vec_id = a.cand_id
      JOIN rel b ON b.cand_id <> a.cand_id
      JOIN v vb ON vb.vec_id = b.cand_id
    ),
    sel(step, picked, score, picked_list) AS (
      (SELECT 1, cand_id, {_MMR_REL_W} * rel, [cand_id]
       FROM rel ORDER BY rel DESC, cand_id LIMIT 1)
      UNION ALL
      (SELECT step + 1, cand_id, score, list_append(picked_list, cand_id) FROM (
        SELECT s.step, s.picked_list, c.cand_id,
               {_MMR_REL_W} * c.rel - {_MMR_DIV_W} * (
                 SELECT max(sim) FROM sims
                 WHERE a = c.cand_id AND list_contains(s.picked_list, b)) AS score
        FROM sel s JOIN rel c ON NOT list_contains(s.picked_list, c.cand_id)
        WHERE s.step < {MMR_K}
        ORDER BY score DESC, c.cand_id LIMIT 1))
    )
    SELECT CAST(step AS INT) AS rnk, picked AS vec_id, CAST(score AS BIGINT) AS mmr
    FROM sel ORDER BY rnk
    """,
)
def emb_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR (maximal marginal relevance) diversified retrieval — the
    training-data-curation shape of top-k: greedily pick items maximizing
    relevance-to-probe minus similarity-to-already-picked, so the selected
    set covers the neighborhood instead of returning near-duplicates.

    Scale split: candidate generation is DISTRIBUTED (1-row probe
    broadcast against the corpus, TakeOrdered pool cut — at 100 TB swap
    in the LSH/IVF tiers for the same pool); the greedy re-rank is
    inherently sequential but runs over a BOUNDED pool (24 candidates,
    552 pair rows) as ONE Arrow-batched applyInPandas group where the
    pairs already live — no driver collect, no unbounded state.

    Determinism: relevance and pairwise similarity are scaled-int dot
    products (bigint); the MMR score 7*rel − 3*max_sim stays in int64, so
    the argmax (tie-break cand_id) is exact on both engines. The oracle
    replays the greedy loop as a recursive CTE carrying the picked list."""
    import pandas as pd

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    probe = v.filter(F.col("vec_id") == 0).select(F.col("e").alias("pe"))
    rel = (
        v.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("cand_id"),
            _idot(F.col("pe"), F.col("e")).alias("rel"),
            "e",
        )
        .orderBy(F.desc("rel"), "cand_id")
        .limit(MMR_POOL)
        # the pair self-join references this subtree on both sides
        .localCheckpoint(eager=False)
    )
    a = rel.select(
        F.col("cand_id").alias("a"), F.col("e").alias("ea"), F.col("rel").alias("rel_a")
    )
    b = rel.select(F.col("cand_id").alias("b"), F.col("e").alias("eb"))
    pairs = (
        a.join(F.broadcast(b), F.col("a") != F.col("b"))
        .select("a", "b", "rel_a", _idot(F.col("ea"), F.col("eb")).alias("sim"))
    )

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rels: dict[int, int] = {}
        sims: dict[tuple[int, int], int] = {}
        for r in pdf.itertuples(index=False):
            rels[int(r.a)] = int(r.rel_a)
            sims[(int(r.a), int(r.b))] = int(r.sim)
        cands = sorted(rels)  # ascending id → first-wins = smallest-id tie-break
        picked: list[int] = []
        rows = []
        for step in range(1, MMR_K + 1):
            best_score, best_c = None, None
            for c in cands:
                if c in picked:
                    continue
                if picked:
                    score = _MMR_REL_W * rels[c] - _MMR_DIV_W * max(
                        sims[(c, p)] for p in picked
                    )
                else:
                    score = _MMR_REL_W * rels[c]
                if best_score is None or score > best_score:
                    best_score, best_c = score, c
            picked.append(best_c)
            rows.append((step, best_c, best_score))
        return pd.DataFrame(rows, columns=["rnk", "vec_id", "mmr"])

    return (
        pairs.groupBy(F.lit(1).alias("g"))
        .applyInPandas(greedy, "rnk INT, vec_id BIGINT, mmr BIGINT")
        .orderBy("rnk")
    )


KNN_K = 10


@query(
    "emb_knn_classify",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings
    ), probes AS (
      SELECT vec_id AS probe_id, e AS pe FROM v WHERE vec_id < {N_PROBES}
    ), scored AS (
      SELECT p.probe_id, c.vec_id AS cand_id, c.label,
             {_sql_ddot('p.pe', 'c.e')} /
             (SQRT({_sql_ddot('p.pe', 'p.pe')}) * SQRT({_sql_ddot('c.e', 'c.e')})) AS cosine
      FROM probes p, v c WHERE c.vec_id <> p.probe_id
    ), nn AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY probe_id
                                     ORDER BY cosine DESC, cand_id) AS rnk
        FROM scored) WHERE rnk <= {KNN_K}
    ), votes AS (
      SELECT probe_id, label, count(*) AS n_votes FROM nn GROUP BY 1, 2
    )
    SELECT probe_id, CAST(label AS INT) AS pred_label,
           CAST(n_votes AS BIGINT) AS n_votes
    FROM (SELECT *, row_number() OVER (PARTITION BY probe_id
                                       ORDER BY n_votes DESC, label) AS r
          FROM votes)
    WHERE r = 1 ORDER BY probe_id
    """,
)
def emb_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-label classification — the weak-supervision labeling
    pass of a curation pipeline (label unlabeled data from its nearest
    labeled neighbors). Majority over the 10 nearest by exact cosine;
    ties break to the smaller label (then the earlier candidate via the
    rank window), fully deterministic.

    Scale: identical shape to emb_cosine_topk — broadcast probes, one
    per-probe rank window (swap in the LSH/IVF candidate tiers at 100 TB);
    the vote is a probe-keyed aggregate over k rows, then a k-bounded
    window. Nothing corpus-sized shuffles twice."""
    v = load_table(spark, sf_dir, "embeddings", spread=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    )
    vn = v.withColumn("nrm", F.sqrt(_ddot(F.col("e"), F.col("e"))))
    probes = vn.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("e").alias("pe"),
        F.col("nrm").alias("pn"),
    )
    pairs = F.broadcast(probes).join(vn, F.col("vec_id") != F.col("probe_id"))
    cosine = _ddot(F.col("pe"), F.col("e")) / (F.col("pn") * F.col("nrm"))
    scored = pairs.select(
        "probe_id", F.col("vec_id").alias("cand_id"), "label", cosine.alias("cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), "cand_id")
    nn = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= KNN_K
    )
    votes = nn.groupBy("probe_id", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    vw = Window.partitionBy("probe_id").orderBy(F.desc("n_votes"), "label")
    return (
        votes.withColumn("r", F.row_number().over(vw))
        .filter(F.col("r") == 1)
        .select(
            "probe_id",
            F.col("label").cast("int").alias("pred_label"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
        )
        .orderBy("probe_id")
    )


# the recall oracle embeds the two sibling oracles VERBATIM as CTE bodies
# (registry.ORACLE is already populated by the decorators above) — the
# metric can never diverge from the queries it measures
from codegraphdb_spark.registry import ORACLE as _ORACLE  # noqa: E402


@query(
    "emb_recall_at_k",
    oracle=f"""
    WITH exact AS ({_ORACLE['emb_cosine_topk']}),
    ann AS ({_ORACLE['emb_ann_topk']}),
    hits AS (
      SELECT e.probe_id, count(*) AS n_hits
      FROM exact e JOIN ann a
        ON a.probe_id = e.probe_id AND a.cand_id = e.cand_id
      GROUP BY 1
    ),
    per AS (SELECT probe_id, count(*) AS k FROM exact GROUP BY 1)
    SELECT per.probe_id,
           CAST(per.k AS BIGINT) AS k,
           CAST(coalesce(hits.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(100 * coalesce(hits.n_hits, 0) // per.k AS BIGINT) AS recall_pct
    FROM per LEFT JOIN hits ON hits.probe_id = per.probe_id
    ORDER BY per.probe_id
    """,
)
def emb_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measured IN-ENGINE, as a first-class query ('measure,
    don't guess'): per-probe recall@k of the LSH-bucketed tier against
    brute-force cosine — the number the tools/stress_ann.py offline
    harness reports, now under the driver's value-hash gate. A banding
    or signature regression shows up as a recall drop here even when
    both tiers individually still hash-match their own oracles' buckets.

    Scale: both inputs are k-per-probe result sets (tiny); the metric
    join is probe-keyed over 2·k·n_probes rows."""
    exact = emb_cosine_topk(spark, sf_dir).select("probe_id", "cand_id")
    ann = emb_ann_topk(spark, sf_dir).select("probe_id", "cand_id")
    hits = exact.join(ann, ["probe_id", "cand_id"]).groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    per = exact.groupBy("probe_id").agg(F.count(F.lit(1)).alias("k"))
    return (
        per.join(hits, "probe_id", "left")
        .select(
            "probe_id",
            F.col("k").cast("bigint").alias("k"),
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.expr("100 * coalesce(n_hits, 0) div k").cast("bigint").alias("recall_pct"),
        )
        .orderBy("probe_id")
    )


@query(
    "emb_centroid_affinity",
    oracle="""
    WITH expl AS (
      SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, (SELECT UNNEST(generate_series(1, 64)) AS i)
    ), cent AS (
      SELECT label, pos,
             CAST(CAST(SUM(CAST(ROUND(x * 1000000000) AS BIGINT)) AS DOUBLE)
                  / COUNT(*) / 1000000000 AS DOUBLE) AS cval
      FROM expl GROUP BY label, pos
    )
    SELECT a.label AS label_a, b.label AS label_b,
           CAST(CAST(SUM(CAST(ROUND(a.cval * b.cval * 1000000) AS BIGINT))
                AS DOUBLE) / 1000000 AS DOUBLE) AS dot
    FROM cent a JOIN cent b ON a.pos = b.pos AND a.label <= b.label
    GROUP BY a.label, b.label
    ORDER BY label_a, label_b
    """,
)
def emb_centroid_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-cluster affinity matrix: pairwise dot products between the
    per-label centroids — the diagnostic that tells you which label
    clusters overlap before trusting label-blocked dedup or IVF routing.
    Exactness chain: centroid components are scaled-int-exact means
    (identical doubles both engines), each cross term is ONE double
    multiply rounded back into the scaled-int domain, and the 64-term
    reduction is an int64 sum — order-free. The join is centroid-sized
    (labels × 64 rows) — at 100 TB this runs on the aggregate of the
    corpus, never the corpus; no sqrt anywhere (libm-unsafe), so the
    matrix is raw dot products, with self-affinity on the diagonal."""
    cent = emb_centroid_by_label(spark, sf_dir).withColumnRenamed(
        "centroid_val", "cval"
    )
    a = cent.select(
        F.col("label").alias("label_a"), "pos", F.col("cval").alias("cval_a")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "pos", F.col("cval").alias("cval_b")
    )
    return (
        a.join(b, "pos")
        .filter(F.col("label_a") <= F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            (
                F.sum(
                    F.round(F.col("cval_a") * F.col("cval_b") * 1_000_000).cast(
                        "bigint"
                    )
                ).cast("double")
                / 1_000_000
            )
            .cast("double")
            .alias("dot")
        )
        .orderBy("label_a", "label_b")
    )


@query(
    "emb_label_outliers",
    oracle="""
    WITH expl AS (
      SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, (SELECT UNNEST(generate_series(1, 64)) AS i)
    ), cent AS (
      SELECT label, pos,
             CAST(CAST(SUM(CAST(ROUND(x * 1000000000) AS BIGINT)) AS DOUBLE)
                  / COUNT(*) / 1000000000 AS DOUBLE) AS cval
      FROM expl GROUP BY label, pos
    ), affinity AS (
      SELECT e.vec_id, e.label,
             SUM(CAST(ROUND(e.x * c.cval * 1000000) AS BIGINT)) AS dot_scaled
      FROM expl e JOIN cent c ON c.label = e.label AND c.pos = e.pos
      GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label,
           CAST(dot_scaled AS BIGINT) AS dot_scaled,
           CAST(rnk AS INT) AS outlier_rank
    FROM (
      SELECT vec_id, label, dot_scaled,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY dot_scaled, vec_id) AS rnk
      FROM affinity)
    WHERE rnk <= 5
    ORDER BY label, outlier_rank
    """,
)
def emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-noise screening: the 5 vectors LEAST aligned with their own
    label's centroid (lowest centroid dot product) per label — the
    cheap first-pass mislabel/outlier filter a labeling pipeline runs
    before training. Exactness: centroid components are scaled-int means,
    each vector×centroid term rounds into the scaled-int domain before
    the order-free int64 sum, and the per-label ranking breaks ties on
    vec_id. One corpus-keyed aggregate + one label-partitioned window;
    the centroid side is labels × 64 rows (broadcast at any scale)."""
    v = load_table(spark, sf_dir, "embeddings")
    expl = v.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos0", "x"),
    ).select("vec_id", "label", (F.col("pos0") + 1).cast("int").alias("pos"), "x")
    cent = emb_centroid_by_label(spark, sf_dir).withColumnRenamed(
        "centroid_val", "cval"
    )
    affinity = (
        expl.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                F.round(F.col("x") * F.col("cval") * 1_000_000).cast("bigint")
            ).alias("dot_scaled")
        )
    )
    w = Window.partitionBy("label").orderBy("dot_scaled", "vec_id")
    return (
        affinity.withColumn("outlier_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("outlier_rank") <= 5)
        .select("vec_id", "label", "dot_scaled", "outlier_rank")
        .orderBy("label", "outlier_rank")
    )
