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
