"""Frequent-shingle df cap in the n-gram Jaccard inverted-index join.

A shingle appearing in d documents contributes O(d^2) candidate pairs to the
self-join; one boilerplate shingle across 10^6 docs at 100 TB would generate
10^12 pairs. NGRAM_DF_CAP drops such shingles before the join. These tests
pin (a) the explosion is actually eliminated, (b) low-df signal survives,
(c) the cap is inert at fixture scale (max fixture df is 25 << 256).
"""

from __future__ import annotations

import pytest

from codegraphdb_spark.queries.text import NGRAM_DF_CAP, _jaccard_pairs_uncached


@pytest.fixture(scope="module")
def hot_shingle_dir(spark, tmp_path_factory):
    """40 DISTINCT docs sharing one boilerplate shingle (set-df=40) plus
    two docs sharing one rare shingle (df=2, Jaccard 1/3). Docs are
    distinct on purpose: identical docs collapse to one shingle SET since
    the r6 overlap restructure and their pairs bypass the join entirely
    (see test_identical_clique_reported)."""
    d = tmp_path_factory.mktemp("hotshingle")
    rows = [(i, f"HOT1 HOT2 HOT3 u{i}") for i in range(1, 41)]
    rows += [(41, "x y z q"), (42, "x y z r")]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_hot_shingle_pairs_bounded(spark, hot_shingle_dir):
    capped = _jaccard_pairs_uncached(spark, hot_shingle_dir, df_cap=10).collect()
    # the 40-doc boilerplate clique (780 pairs through the hot shingle) is
    # gone; the rare-shingle pair (df=2 <= cap, jaccard 1/3 >= 0.2) survives
    assert [(r.doc_a, r.doc_b) for r in capped] == [(41, 42)]
    assert capped[0].jaccard == pytest.approx(1 / 3)


def test_uncapped_explodes(spark, hot_shingle_dir):
    # sanity: without the cap the boilerplate clique IS quadratic — each
    # doc holds 2 shingles (HOT triple + its unique tail window) and every
    # pair shares the HOT one (jaccard 1/3), plus the rare pair
    uncapped = _jaccard_pairs_uncached(spark, hot_shingle_dir, df_cap=10**9)
    assert uncapped.count() == 40 * 39 // 2 + 1


def test_identical_clique_reported(spark, tmp_path_factory):
    """BYTE-IDENTICAL docs collapse to one shingle set (r6 overlap
    restructure): their pairs are emitted directly as equal-set rows —
    exact-duplicate signal the uncapped ORACLE also reports — at
    O(output) cost with ZERO candidate-join work, so the df cap (whose
    job is bounding join work) deliberately does not suppress them."""
    d = tmp_path_factory.mktemp("identclique")
    rows = [(i, "HOT1 HOT2 HOT3") for i in range(1, 41)]
    spark.createDataFrame(rows, "doc_id bigint, text string").write.parquet(
        str(d / "documents.parquet")
    )
    got = _jaccard_pairs_uncached(spark, str(d), df_cap=10).collect()
    assert len(got) == 40 * 39 // 2
    assert all(r.jaccard == 1.0 for r in got)


def test_default_cap_inert_at_fixture_scale(spark):
    # max shingle df observed in fixtures is 25 (sf0.1); the default cap
    # must sit far above it so oracle results are unchanged at test scale
    assert NGRAM_DF_CAP >= 10 * 25
