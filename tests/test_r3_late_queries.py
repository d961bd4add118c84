"""Behavioral invariants for the late round-3 catalog additions (the
oracle-differential harness checks exact values; these tests check the
semantic properties that must survive ANY fixture, scale factor or
partitioning — the properties a 100 TB run relies on)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.queries.relational import (
    cube_returns_report,
    rollup_orders_report,
)
from codegraphdb_spark.queries.similarity import emb_dim_stats
from codegraphdb_spark.queries.text import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_BUDGET,
    doc_chunk_windows,
    doc_pack_sequences,
)
from codegraphdb_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def test_rollup_grand_total_consistent(spark):
    rows = rollup_orders_report(spark, SF_SMALL).collect()
    detail = [r for r in rows if r.gid == 0]
    subtotal = [r for r in rows if r.gid == 1]
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1
    assert grand[0].n_orders == sum(r.n_orders for r in detail)
    assert grand[0].sum_totalprice == pytest.approx(
        sum(r.sum_totalprice for r in detail)
    )
    # every status subtotal equals the sum of its detail rows
    for s in subtotal:
        mine = [r for r in detail if r.o_orderstatus == s.o_orderstatus]
        assert s.n_orders == sum(r.n_orders for r in mine)


def test_cube_margins_consistent(spark):
    rows = cube_returns_report(spark, SF_SMALL).collect()
    detail = [r for r in rows if r.gid == 0]
    grand = [r for r in rows if r.gid == 3]
    # CUBE(2 cols) on (flags x status) — every margin present
    gids = {r.gid for r in rows}
    assert gids == {0, 1, 2, 3}
    assert grand[0].n_items == sum(r.n_items for r in detail)
    # column-margin (gid=2: l_returnflag is NULL) sums detail per status
    for m in (r for r in rows if r.gid == 2):
        mine = [r for r in detail if r.l_linestatus == m.l_linestatus]
        assert m.n_items == sum(r.n_items for r in mine)


def test_chunk_windows_cover_and_overlap(spark):
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    n_by_doc = {r.doc_id: r.n for r in docs.collect()}
    chunks = doc_chunk_windows(spark, SF_SMALL).collect()
    by_doc: dict[int, list] = {}
    for c in chunks:
        by_doc.setdefault(c.doc_id, []).append(c)
    assert set(by_doc) == set(n_by_doc)
    for doc_id, cs in by_doc.items():
        n = n_by_doc[doc_id]
        # exactly ceil(n/stride) windows, consecutive indices from 0
        assert len(cs) == max(1, math.ceil(n / CHUNK_STRIDE))
        assert sorted(c.chunk_idx for c in cs) == list(range(len(cs)))
        for c in cs:
            assert c.start_tok == c.chunk_idx * CHUNK_STRIDE + 1
            expect = min(CHUNK_TOKENS, n - c.start_tok + 1)
            assert c.n_chunk_tokens == expect
            assert len(c.chunk_text.split(" ")) == c.n_chunk_tokens


def test_pack_sequences_bins_are_contiguous_and_bounded(spark):
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n")
    )
    tok = {(r.source, r.doc_id): r.n for r in docs.collect()}
    total = {}
    for (src, _), n in tok.items():
        total[src] = total.get(src, 0) + n
    bins = doc_pack_sequences(spark, SF_SMALL).collect()
    max_doc = max(tok.values())
    by_src: dict[str, list] = {}
    for b in bins:
        by_src.setdefault(b.source, []).append(b)
    for src, bs in by_src.items():
        bs = sorted(bs, key=lambda b: b.bin_id)
        # bins partition the doc stream: token totals add up exactly
        assert sum(b.bin_tokens for b in bs) == total[src]
        # contiguous, non-overlapping doc ranges
        for prev, nxt in zip(bs, bs[1:]):
            assert prev.last_doc < nxt.first_doc
        # a bin overflows the budget by at most one document's length
        for b in bs:
            assert b.bin_tokens < PACK_BUDGET + max_doc


def test_emb_dim_stats_moment_sanity(spark):
    rows = emb_dim_stats(spark, SF_SMALL).collect()
    n_vec = load_table(spark, SF_SMALL, "embeddings").count()
    assert [r.dim for r in rows] == list(range(1, 65))
    for r in rows:
        assert r.n_vals == n_vec
        assert r.var_val >= 0.0
        assert r.min_val <= r.mean_val <= r.max_val


def test_pq_encode_seed_vectors_are_exact(spark):
    """The codebook is the subvectors of vec_id < PQ_K, so those vectors
    must encode to their own index in every subspace with zero
    reconstruction error."""
    from codegraphdb_spark.queries.similarity import PQ_K, PQ_M, emb_pq_encode

    rows = {r.vec_id: r for r in emb_pq_encode(spark, SF_SMALL).collect()}
    for k in range(PQ_K):
        assert rows[k].recon_err == 0
        assert rows[k].codes == ",".join([str(k)] * PQ_M)
    # non-seed vectors have non-negative error and full-length codes
    for r in rows.values():
        assert r.recon_err >= 0
        assert len(r.codes.split(",")) == PQ_M


def test_pq_adc_agrees_with_explicit_reconstruction(spark):
    """ADC distance must equal the sum of the candidate's chosen per-
    subspace distances computed against the probe — verify one probe's
    ranking against a direct numpy recomputation."""
    import numpy as np

    from codegraphdb_spark.queries.similarity import (
        PQ_K,
        PQ_M,
        _PQ_SCALE,
        emb_pq_topk,
    )
    from codegraphdb_spark.sources.tables import load_table

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_SMALL, "embeddings").collect()
    }
    sub = len(emb[0]) // PQ_M
    sx = {v: np.rint(e * _PQ_SCALE).astype(np.int64) for v, e in emb.items()}
    cb = [sx[k] for k in range(PQ_K)]

    def codes(v):
        out = []
        for m in range(PQ_M):
            s = slice(m * sub, (m + 1) * sub)
            d = [int(((sx[v][s] - cb[k][s]) ** 2).sum()) for k in range(PQ_K)]
            out.append(min(range(PQ_K), key=lambda k: (d[k], k)))
        return out

    def adc(probe, cand):
        total = 0
        ccodes = codes(cand)
        for m in range(PQ_M):
            s = slice(m * sub, (m + 1) * sub)
            total += int(((sx[probe][s] - cb[ccodes[m]][s]) ** 2).sum())
        return total

    got = [r for r in emb_pq_topk(spark, SF_SMALL).collect() if r.probe_id == 0]
    assert len(got) == 10
    for r in got:
        assert r.adc_dist == adc(0, r.cand_id)
    # ranking really is ascending ADC distance
    dists = [r.adc_dist for r in sorted(got, key=lambda r: r.rnk)]
    assert dists == sorted(dists)


def test_retention_cohort_conservation(spark):
    """Age-0 cell of every cohort counts the whole cohort (everyone is
    active in their first week), and no cell exceeds its cohort size."""
    from codegraphdb_spark.queries.events import events_retention_cohorts

    rows = events_retention_cohorts(spark, SF_SMALL).collect()
    for r in rows:
        assert 0 < r.n_active <= r.cohort_size
        if r.week_age == 0:
            assert r.n_active == r.cohort_size
            assert r.retention == 1.0
