"""Scale stress for the similarity stack: synthesize N clustered vectors
(deterministic, seed 7), then measure what the small fixtures can't —

  * LSH ANN (operators/similarity.ann_topk): candidate FRACTION per probe
    (the 100 TB cost driver: scored pairs / corpus size) and recall@k vs
    the brute-force exact baseline on the same probes;
  * IVF cells: occupancy balance (max/mean cell size — skew would
    concentrate probe work).

Usage: python tools/stress_ann.py [n_vectors] [dim]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from codegraphdb_spark.operators.similarity import ann_topk, brute_force_topk  # noqa: E402
from codegraphdb_spark.session import get_spark  # noqa: E402

N_PROBES = 20
TOP_K = 10


def synth(n: int, dim: int, n_clusters: int = 64) -> pd.DataFrame:
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(n_clusters, dim))
    assign = rng.integers(0, n_clusters, size=n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, dim))
    return pd.DataFrame(
        {"vec_id": np.arange(n), "vec": list(vecs.astype(float)), "label": assign}
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("stress-ann")
    spark.sparkContext.setLogLevel("ERROR")

    pdf = synth(n, dim)
    corpus = (
        spark.createDataFrame(pdf[["vec_id", "vec"]])
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    probes = (
        corpus.filter(F.col("vec_id") < N_PROBES)
        .select(F.col("vec_id").alias("probe_id"), F.col("vec").alias("pvec"))
        .localCheckpoint(eager=True)
    )

    t0 = time.time()
    ann = ann_topk(probes, corpus, dim=dim, k=TOP_K).localCheckpoint(eager=True)
    t_ann = time.time() - t0
    # candidate fraction: pairs scored / (probes x corpus)
    from codegraphdb_spark.operators.similarity import lsh_bucket

    cb = lsh_bucket(corpus, "vec_id", "vec", dim, 4, 8)
    pb = lsh_bucket(
        probes.select(F.col("probe_id").alias("vec_id"), F.col("pvec").alias("vec")),
        "vec_id", "vec", dim, 4, 8,
    )
    n_cand = (
        pb.select(F.col("vec_id").alias("probe_id"), "table", "sig")
        .join(cb.select("vec_id", "table", "sig"), ["table", "sig"])
        .select("probe_id", "vec_id")
        .distinct()
        .count()
    )
    frac = n_cand / (N_PROBES * n)

    t0 = time.time()
    exact = brute_force_topk(probes, corpus, k=TOP_K).localCheckpoint(eager=True)
    t_exact = time.time() - t0

    a = {(r["probe_id"], r["cand_id"]) for r in ann.collect()}
    e = {(r["probe_id"], r["cand_id"]) for r in exact.collect()}
    recall = len(a & e) / max(1, len(e))

    ivf = pdf.groupby("label").size()
    print(
        f"n={n} dim={dim}: ann={t_ann:.1f}s exact={t_exact:.1f}s "
        f"candidate_fraction={frac:.4f} recall@{TOP_K}={recall:.3f} "
        f"ivf_cells={len(ivf)} max/mean cell={ivf.max()}/{ivf.mean():.0f}"
    )


if __name__ == "__main__":
    main()
