"""Scale execution proof for ingest-time incremental dedup.

Runs on the K=10 fixtures (tools/gen_scale.py → testdata_sf1, ~10× the
driver corpus with planted cross-replica duplicates): splits documents
90/10 into corpus/ingest-batch, then measures

  * FULL recompute  — lsh_candidate_pairs over the whole corpus
    (what a naive pipeline pays every ingest), and
  * INCREMENTAL     — lsh_incremental_candidates: the batch probes the
    corpus band buckets,

and asserts the incremental result equals the full result restricted to
delta-touching pairs (same invariant the sf0.01 oracle checks, here
demonstrated at 10×). Prints one JSON line with wall times, pair counts,
and the speedup — the number that justifies the "per-ingest cost scales
with the delta" claim by execution rather than argument.

Usage: python tools/stress_ingest.py [sf_dir]   (default testdata_sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from codegraphdb_spark.queries.text import (  # noqa: E402
    _band_signatures,
    _minhash_sigs_pandas,
    _sig_agreement,
    lsh_candidate_pairs,
    lsh_incremental_candidates,
)
from codegraphdb_spark.session import get_spark  # noqa: E402
from codegraphdb_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    spark = get_spark("stress-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    # signatures are shared input for both paths — checkpoint so neither
    # path's timing includes the Arrow signature stage of the other
    sigs = _minhash_sigs_pandas(docs).localCheckpoint(eager=True)
    delta = sigs.filter(F.col("doc_id") % 10 == 0)
    base = sigs.filter(F.col("doc_id") % 10 != 0)

    t0 = time.time()
    full = lsh_candidate_pairs(sigs).localCheckpoint(eager=True)
    n_full = full.count()
    full_sec = round(time.time() - t0, 3)

    t0 = time.time()
    inc = lsh_incremental_candidates(base, delta).localCheckpoint(eager=True)
    n_inc = inc.count()
    inc_sec = round(time.time() - t0, 3)

    # Production shape: the corpus band table is PERSISTED (the inverted
    # file) — an ingest pays only delta banding + the bucket probe, never
    # corpus re-banding. Same helpers as the operator, base side
    # pre-materialized; includes the within-batch pairs via union so the
    # output contract matches lsh_incremental_candidates exactly.
    persisted = _band_signatures(base.unionByName(delta)).localCheckpoint(
        eager=True
    )
    persisted.count()
    t0 = time.time()
    delta_b = _band_signatures(delta)
    cand = (
        delta_b.alias("a")
        .join(
            persisted.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            F.when(F.col("a.doc_id") < F.col("b.doc_id"), F.col("a.sig"))
            .otherwise(F.col("b.sig"))
            .alias("sig_a"),
            F.when(F.col("a.doc_id") < F.col("b.doc_id"), F.col("b.sig"))
            .otherwise(F.col("a.sig"))
            .alias("sig_b"),
        )
        .distinct()
    )
    probe = _sig_agreement(cand).localCheckpoint(eager=True)
    n_probe = probe.count()
    probe_sec = round(time.time() - t0, 3)

    expected = full.filter(
        (F.col("doc_a") % 10 == 0) | (F.col("doc_b") % 10 == 0)
    )
    mismatch = inc.exceptAll(expected).count() + expected.exceptAll(inc).count()
    mismatch += probe.exceptAll(expected).count() + expected.exceptAll(probe).count()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "full_pairs": n_full,
                "full_sec": full_sec,
                "incremental_pairs": n_inc,
                "incremental_sec": inc_sec,
                "persisted_probe_pairs": n_probe,
                "persisted_probe_sec": probe_sec,
                "speedup_vs_full": round(full_sec / inc_sec, 2) if inc_sec else None,
                "persisted_speedup_vs_full": (
                    round(full_sec / probe_sec, 2) if probe_sec else None
                ),
                "mismatched_rows": mismatch,
            },
            separators=(",", ":"),
        )
    )
    if mismatch:
        raise SystemExit(1)

    # Embedding mirror at the same 10×: the frozen-quantizer probe must
    # complete at scale with every delta vector assigned exactly once
    # (cell-local ranking bounds the pair work by cell occupancy, so this
    # is the execution check that no cell degenerated into all-pairs).
    from codegraphdb_spark import registry

    registry.load_all()
    t0 = time.time()
    probe_rows = registry.QUERIES["emb_incremental_ivf_probe"](
        spark, sf_dir
    ).collect()
    emb_sec = round(time.time() - t0, 3)
    n_delta = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 == 0)
        .count()
    )
    print(
        json.dumps(
            {
                "emb_probe_rows": len(probe_rows),
                "emb_delta_vectors": n_delta,
                "emb_probe_sec": emb_sec,
                "one_row_per_probe": len(probe_rows) == n_delta,
            },
            separators=(",", ":"),
        )
    )
    if len(probe_rows) != n_delta:
        raise SystemExit(1)

    # Streaming twin at the same 10×: the delta lands as parquet files and
    # streams through minhash_candidates_stream in ~4 micro-batches
    # against the static corpus signatures — output must equal the batch
    # incremental result minus its (by-design deferred) delta×delta pairs.
    import tempfile

    from codegraphdb_spark.sources.tables import load_table as _lt
    from codegraphdb_spark.streaming.dedup import minhash_candidates_stream
    from codegraphdb_spark.streaming.events import run_to_memory

    docs = _lt(spark, sf_dir, "documents").select("doc_id", "text")
    with tempfile.TemporaryDirectory() as land:
        docs.filter(F.col("doc_id") % 10 == 0).repartition(4).write.parquet(
            land, mode="overwrite"
        )
        stream = (
            spark.readStream.schema("doc_id BIGINT, text STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        t0 = time.time()
        run_to_memory(
            minhash_candidates_stream(stream, base), "stress_mh_stream", "append"
        )
        stream_sec = round(time.time() - t0, 3)
        got = spark.sql("select * from stress_mh_stream").localCheckpoint(
            eager=True
        )
    want = inc.filter((F.col("doc_a") % 10 != 0) | (F.col("doc_b") % 10 != 0))
    stream_mismatch = got.exceptAll(want).count() + want.exceptAll(got).count()
    print(
        json.dumps(
            {
                "stream_pairs": got.count(),
                "stream_sec": stream_sec,
                "stream_mismatched_rows": stream_mismatch,
            },
            separators=(",", ":"),
        )
    )
    if stream_mismatch:
        raise SystemExit(1)
    print("INGEST STRESS OK")


if __name__ == "__main__":
    main()
