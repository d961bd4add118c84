"""Streaming ingest dedup: the stream-static twin of
queries/text.lsh_incremental_candidates.

Documents arrive on a stream (file landing zone / Kafka — same pipeline
either way); each micro-batch runs the SAME Arrow signature stage and
banding as the batch path (imported, not reimplemented, so constants can
never drift) and probes the STANDING corpus's band table — a
stream-static equi-join, the one Structured Streaming join flavor the
events twins don't already cover (stream-stream interval join lives in
streaming/events.purchase_click_stream_join).

Scale shape: the static side is the persisted corpus band table (bucketed
by band_key); each micro-batch shuffles only its own bands. State: the
pair-dedup keeps (doc_a, doc_b) keys seen this RUN — bounded by the
batch-fold cadence, because folding the accepted batch into the corpus
band table restarts the query against the refreshed static side (the
standard stream-static refresh pattern; static tables are re-read per
micro-batch only at the file-listing level, not re-planned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codegraphdb_spark.queries.text import (
    _band_signatures,
    _minhash_sigs_pandas,
    _sig_agreement,
)


def minhash_candidates_stream(
    doc_stream: DataFrame, base_sigs: DataFrame
) -> DataFrame:
    """Streaming (doc_id, text) rows → candidate near-dup pairs against the
    static corpus signature table (doc_id, sig). Output rows are
    (doc_a, doc_b, n_equal_minhash), pair-normalized exactly like the
    batch incremental path; a pair colliding in several bands inside one
    micro-batch (or across micro-batches) emits once — dropDuplicates on
    the pair key, state bounded by the run's ingest volume (see module
    docstring). Within-batch (delta×delta) pairs are BY DESIGN deferred
    to the fold: they surface when the batch joins the corpus table,
    keeping this query join-state-free on the stream side."""
    sigs = _minhash_sigs_pandas(doc_stream)
    delta_b = _band_signatures(sigs)
    base_b = _band_signatures(base_sigs)
    cand = (
        delta_b.alias("a")
        .join(
            base_b.alias("b"),
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
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return _sig_agreement(cand)
