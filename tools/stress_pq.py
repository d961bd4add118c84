"""Scale stress for the product-quantization tier (emb_pq_* at fixture
scale): synthesize N clustered unit vectors (same generator as
stress_ann, seed 7), train driver-side on a sample (the production
shape: train small, broadcast, encode the corpus distributed), then
measure what the fixtures can't —

  * FLAT PQ vs IVF-PQ (PQ over coarse-cell RESIDUALS): clustered data is
    the adversarial case for flat PQ — quantization error rivals
    within-cluster distances and recall collapses; encoding residuals
    against a coarse quantizer restores it. Both are measured so the
    trade is recorded, not assumed;
  * encode throughput (corpus -> cell + M uint8 codes, one Arrow pass);
  * ADC top-k wall time with per-partition local top-k (shuffle carries
    probes x partitions x k rows, never probes x corpus);
  * recall@k of each ADC ranking vs the exact brute-force baseline;
  * compression ratio (dim x 4 bytes -> M+1 bytes).

Usage: python tools/stress_pq.py [n_vectors] [dim] [shortlist]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from codegraphdb_spark.operators.similarity import brute_force_topk  # noqa: E402
from codegraphdb_spark.session import get_spark  # noqa: E402
from tools.stress_ann import synth  # noqa: E402

N_PROBES = 20
TOP_K = 10
SHORTLIST = 100  # ADC shortlist size for the re-rank stage (argv[3])
PQ_M = 8
PQ_K = 256
COARSE_K = 64
TRAIN_N = 10_000
LLOYD_ITERS = 8


def _lloyd(x: np.ndarray, k: int, order: np.ndarray) -> np.ndarray:
    """Deterministic Lloyd k-means (first-k init on a shuffled sample)."""
    c = x[order[:k]].copy()
    for _ in range(LLOYD_ITERS):
        # argmin_j ||x-c_j||^2 == argmin_j (||c_j||^2 - 2 x.c_j)
        a = ((c**2).sum(axis=1)[None, :] - 2 * x @ c.T).argmin(axis=1)
        for j in range(k):
            mask = a == j
            if mask.any():
                c[j] = x[mask].mean(axis=0)
    return c


def _assign(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    return ((c**2).sum(axis=1)[None, :] - 2 * x @ c.T).argmin(axis=1)


def train_codebook(sample: np.ndarray, coarse: np.ndarray | None) -> np.ndarray:
    """(PQ_M, PQ_K, sub) per-subspace codebook; with a coarse quantizer,
    trains on RESIDUALS (IVF-PQ, shared codebook across cells)."""
    n, dim = sample.shape
    sub = dim // PQ_M
    if coarse is not None:
        sample = sample - coarse[_assign(sample, coarse)]
    rng = np.random.default_rng(7)
    order = rng.permutation(n)
    books = np.empty((PQ_M, PQ_K, sub))
    for m in range(PQ_M):
        books[m] = _lloyd(sample[:, m * sub : (m + 1) * sub], PQ_K, order)
    return books


def run_variant(
    spark,
    corpus,
    vecs: np.ndarray,
    coarse: np.ndarray | None,
    exact_pairs: set,
) -> str:
    """Train → distributed encode → ADC top-k → recall, for flat PQ
    (coarse=None) or IVF-PQ (PQ over coarse residuals)."""
    n, dim = vecs.shape
    sub = dim // PQ_M
    t0 = time.time()
    books = train_codebook(vecs[:TRAIN_N], coarse)
    t_train = time.time() - t0
    bbooks = spark.sparkContext.broadcast(books)
    bcoarse = spark.sparkContext.broadcast(coarse)

    def encode(it):
        cb, co = bbooks.value, bcoarse.value
        for b in it:
            x = np.stack(b["vec"].to_numpy())
            if co is not None:
                cells = _assign(x, co)
                x = x - co[cells]
            else:
                cells = np.zeros(len(x), dtype=np.int64)
            codes = np.empty((len(x), PQ_M), dtype=np.int64)
            for m in range(PQ_M):
                xs = x[:, m * sub : (m + 1) * sub]
                codes[:, m] = (
                    -2 * xs @ cb[m].T + (cb[m] ** 2).sum(axis=1)[None, :]
                ).argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": b["vec_id"], "cell": cells, "codes": list(codes)}
            )

    t0 = time.time()
    coded = corpus.mapInPandas(
        encode, schema="vec_id long, cell long, codes array<long>"
    ).localCheckpoint(eager=True)
    t_encode = time.time() - t0

    probes_np = vecs[:N_PROBES]
    n_cells = 1 if coarse is None else len(coarse)
    # per-(probe, cell) ADC tables: residual of the probe against each
    # cell's centroid x the shared codebook — (P, C, M, K), tiny, broadcast
    tables = np.empty((N_PROBES, n_cells, PQ_M, PQ_K))
    for c in range(n_cells):
        rp = probes_np if coarse is None else probes_np - coarse[c]
        for m in range(PQ_M):
            ps = rp[:, m * sub : (m + 1) * sub]
            tables[:, c, m, :] = (
                (ps[:, None, :] - books[m][None, :, :]) ** 2
            ).sum(axis=2)
    btables = spark.sparkContext.broadcast(tables)

    def adc_local_topk(it):
        tb = btables.value
        marange = np.arange(PQ_M)
        for b in it:
            ids = b["vec_id"].to_numpy()
            cells = b["cell"].to_numpy()
            codes = np.stack(b["codes"].to_numpy())  # (rows, M)
            out_p, out_c, out_d = [], [], []
            for p in range(N_PROBES):
                d = tb[p][cells[:, None], marange[None, :], codes].sum(axis=1)
                keep = min(SHORTLIST + 1, len(d))
                idx = np.argpartition(d, keep - 1)[:keep]
                out_p.extend([p] * len(idx))
                out_c.extend(ids[idx])
                out_d.extend(d[idx])
            yield pd.DataFrame({"probe_id": out_p, "cand_id": out_c, "dist": out_d})

    t0 = time.time()
    local = coded.mapInPandas(
        adc_local_topk, schema="probe_id long, cand_id long, dist double"
    )
    w = Window.partitionBy("probe_id").orderBy("dist", "cand_id")
    adc = (
        local.filter(F.col("cand_id") != F.col("probe_id"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= SHORTLIST)
        .localCheckpoint(eager=True)
    )
    t_adc = time.time() - t0
    rows = adc.collect()
    a10 = {(r["probe_id"], r["cand_id"]) for r in rows if r["rnk"] <= TOP_K}
    recall_adc = len(a10 & exact_pairs) / max(1, len(exact_pairs))
    # production pattern: ADC shortlist -> exact re-rank of SHORTLIST ids
    # (driver-side numpy here; distributed it is a semi-join + one scorer
    # pass over probes x SHORTLIST rows — never probes x corpus)
    rerank_pairs = set()
    for p in range(N_PROBES):
        cands = np.array([r["cand_id"] for r in rows if r["probe_id"] == p])
        sims = vecs[cands] @ vecs[p]
        top = cands[np.argsort(-sims, kind="stable")[:TOP_K]]
        rerank_pairs.update((p, int(c)) for c in top)
    recall_rr = len(rerank_pairs & exact_pairs) / max(1, len(exact_pairs))
    tag = "ivfpq" if coarse is not None else "flatpq"
    return (
        f"{tag}: train={t_train:.1f}s encode={t_encode:.1f}s "
        f"adc={t_adc:.1f}s adc_recall@{TOP_K}={recall_adc:.3f} "
        f"rerank{SHORTLIST}_recall@{TOP_K}={recall_rr:.3f}"
    )


def main() -> None:
    global SHORTLIST
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if len(sys.argv) > 3:
        SHORTLIST = int(sys.argv[3])
    spark = get_spark("stress-pq")
    spark.sparkContext.setLogLevel("ERROR")

    pdf = synth(n, dim)
    vecs = np.stack(pdf["vec"].to_numpy())
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    pdf["vec"] = list(vecs)

    corpus = (
        spark.createDataFrame(pdf[["vec_id", "vec"]])
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    probes_df = (
        corpus.filter(F.col("vec_id") < N_PROBES)
        .select(F.col("vec_id").alias("probe_id"), F.col("vec").alias("pvec"))
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    exact = brute_force_topk(probes_df, corpus, k=TOP_K).localCheckpoint(eager=True)
    t_exact = time.time() - t0
    exact_pairs = {(r["probe_id"], r["cand_id"]) for r in exact.collect()}

    rng = np.random.default_rng(11)
    order = rng.permutation(min(TRAIN_N, n))
    coarse = _lloyd(vecs[:TRAIN_N], COARSE_K, order)

    flat = run_variant(spark, corpus, vecs, None, exact_pairs)
    ivf = run_variant(spark, corpus, vecs, coarse, exact_pairs)
    ratio = (dim * 4) / (PQ_M + 1)
    print(
        f"n={n} dim={dim} M={PQ_M} K={PQ_K} coarse={COARSE_K}: "
        f"exact={t_exact:.1f}s | {flat} | {ivf} | "
        f"compression={ratio:.0f}x ({PQ_M + 1} B/vec vs {dim * 4} B/vec)"
    )


if __name__ == "__main__":
    main()
