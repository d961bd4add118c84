"""Invariant tests for the exact duplicate-span operators (ExactSubstr
family) and the cross-source overlap matrix — algebraic guarantees the
oracle differential can't express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark import registry
from codegraphdb_spark.queries.text import DUP_SPAN_K


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_dup_spans_are_disjoint_and_well_formed(spark, sf_dir):
    rows = registry.QUERIES["doc_dup_spans"](spark, sf_dir).collect()
    assert rows, "fixture corpus must contain at least one duplicate span"
    by_doc: dict[int, list] = {}
    for r in rows:
        # spans cover at least one full K-gram and the island arithmetic
        # is consistent: max start - min start + K == token length
        assert r.span_tokens >= DUP_SPAN_K
        assert r.span_end - r.span_start + 1 == r.span_tokens
        assert r.n_dup_grams >= 1
        assert r.n_dup_grams <= r.span_tokens - DUP_SPAN_K + 1
        by_doc.setdefault(r.doc_id, []).append(r)
    for spans in by_doc.values():
        spans.sort(key=lambda r: r.span_start)
        for prev, nxt in zip(spans, spans[1:]):
            # disjoint (the merge rule guarantees a real gap: the next
            # span's first dup gram starts more than K-1 past the last)
            assert nxt.span_start > prev.span_end


def test_dup_span_text_really_is_duplicated(spark, sf_dir):
    """The defining property: the token run of every reported span occurs
    verbatim in at least one OTHER document."""
    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    corpus_grams: dict[str, set] = {}
    for did, toks in docs.items():
        for i in range(len(toks) - DUP_SPAN_K + 1):
            corpus_grams.setdefault(
                " ".join(toks[i : i + DUP_SPAN_K]), set()
            ).add(did)
    rows = registry.QUERIES["doc_dup_spans"](spark, sf_dir).collect()
    for r in rows[:200]:
        toks = docs[r.doc_id]
        # every span is a union of >=2-doc K-grams; check its first gram
        gram = " ".join(toks[r.span_start - 1 : r.span_start - 1 + DUP_SPAN_K])
        assert len(corpus_grams[gram]) >= 2


def test_dup_span_stats_consistent_with_spans(spark, sf_dir):
    spans = registry.QUERIES["doc_dup_spans"](spark, sf_dir).collect()
    stats = {r.doc_id: r for r in registry.QUERIES["doc_dup_span_stats"](spark, sf_dir).collect()}
    cov: dict[int, int] = {}
    cnt: dict[int, int] = {}
    for r in spans:
        cov[r.doc_id] = cov.get(r.doc_id, 0) + r.span_tokens
        cnt[r.doc_id] = cnt.get(r.doc_id, 0) + 1
    for did, s in stats.items():
        assert s.dup_tokens == cov.get(did, 0)
        assert s.n_spans == cnt.get(did, 0)
        assert 0 <= s.dup_fraction <= 1.0
        assert s.dup_tokens <= s.n_tokens
        assert s.substr_keep == (1 if s.dup_fraction < 0.25 else 0)


def test_source_overlap_matrix_bounds(spark, sf_dir):
    rows = registry.QUERIES["source_overlap_matrix"](spark, sf_dir).collect()
    assert rows
    srcs = set()
    for r in rows:
        assert r.source_a < r.source_b
        srcs.update((r.source_a, r.source_b))
        assert 0 < r.n_common <= min(r.nsh_a, r.nsh_b)
        assert 0.0 < r.jaccard <= 1.0
        # Jaccard recomposes from the integer parts exactly
        assert r.jaccard == r.n_common / (r.nsh_a + r.nsh_b - r.n_common)
    n = len(srcs)
    assert len(rows) <= n * (n - 1) // 2


def test_import_cycles_finds_exactly_the_fixture_sccs(spark):
    """The cycle fixture has one 3-cycle (routes→models→db→routes), one
    2-cycle (forms↔views), and acyclic web.utils / web / web.models.Item —
    only the five cyclic modules may appear."""
    rows = registry.QUERIES["g_import_cycles"](spark, "").collect()
    got = {(r.component, r.member, r.scc_size, r.cycle_len) for r in rows}
    assert got == {
        ("web.db", "web.db", 3, 3),
        ("web.db", "web.models", 3, 3),
        ("web.db", "web.routes", 3, 3),
        ("web.forms", "web.forms", 2, 2),
        ("web.forms", "web.views", 2, 2),
    }


def test_module_coupling_matches_handcount(spark):
    """v1 fixture hand-count: pkga/__init__ (module 'pkga') imports
    pkga.base + pkga.util; dog imports pkga(+base,consts); etc. Check a
    few anchor rows instead of duplicating the whole derivation."""
    rows = {r.module: r for r in registry.QUERIES["g_module_coupling"](spark, "").collect()}
    # pkga.base is imported by pkga/__init__, pkgb.dog — afferent >= 2,
    # imports nothing
    assert rows["pkga.base"].efferent == 0
    assert rows["pkga.base"].afferent >= 2
    # every instability is in [0,1] or NULL
    for r in rows.values():
        assert r.instability is None or 0.0 <= r.instability <= 1.0
        if r.afferent + r.efferent == 0:
            assert r.instability is None


def test_cusum_telescoped_equals_direct_recursion(spark, sf_dir):
    """The window formulation must equal the textbook recursion
    S+_i = max(0, S+_{i-1} + d_i - k), S-_i = max(0, S-_{i-1} - d_i - k)
    replayed per event type in plain Python over the same scaled ints."""
    from codegraphdb_spark.queries.events import _CUSUM_SCALE

    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "ts", "value"
    ).collect()
    got = {
        r.event_id: r
        for r in registry.QUERIES["events_cusum_drift"](spark, sf_dir).collect()
    }
    bytype: dict[str, list] = {}
    for r in e:
        bytype.setdefault(r.event_type, []).append(r)
    import math

    from decimal import ROUND_HALF_UP, Decimal

    def _hup(x: float) -> int:
        # the query rounds with Spark F.round == HALF_UP; Python round()
        # is banker's (HALF_EVEN) and diverges exactly on .5 boundaries
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    for typ, rows in bytype.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        vs = [_hup(r.value * _CUSUM_SCALE) for r in rows]
        n = len(vs)
        mu = _hup(sum(vs) / n)
        var = max(sum(v * v for v in vs) / n - (sum(vs) / n) ** 2, 0.0)
        sigma = _hup(math.sqrt(var))
        k = sigma // 2
        sp = sn = 0
        for r, v in zip(rows, vs):
            d = v - mu
            sp = max(0, sp + d - k)
            sn = max(0, sn - d - k)
            g = got[r.event_id]
            assert g.cusum_pos == sp / _CUSUM_SCALE, (typ, r.event_id)
            assert g.cusum_neg == sn / _CUSUM_SCALE, (typ, r.event_id)
            assert g.drift_flag == (1 if (sp > 8 * sigma or sn > 8 * sigma) else 0)


def test_scrub_conserves_tokens_and_never_keeps_dup_grams(spark, sf_dir):
    """Scrubbed token count = n_tokens - coverage from the stats query;
    fully-covered docs end at zero, untouched docs at n_tokens."""
    stats = {r.doc_id: r for r in registry.QUERIES["doc_dup_span_stats"](spark, sf_dir).collect()}
    scrub = registry.QUERIES["doc_dup_span_scrub"](spark, sf_dir).collect()
    assert len(scrub) == len(stats)
    import hashlib
    empty_md5 = hashlib.md5(b"").hexdigest()
    for r in scrub:
        s = stats[r.doc_id]
        assert r.n_tokens == s.n_tokens
        assert r.n_tokens_kept == s.n_tokens - s.dup_tokens
        if r.n_tokens_kept == 0:
            assert r.scrubbed_md5 == empty_md5


def test_dead_code_exact_fixture_set(spark):
    """Hand-derived liveness over the two-version fixture: shout has no
    caller, roll is v2-new with no caller, Puppy is never instantiated or
    inherited, whine never called; Animal.speak/describe are the
    documented overridden-base static-liveness caveat."""
    rows = registry.QUERIES["g_dead_code"](spark, "").collect()
    assert {r.full_name for r in rows} == {
        "pkga.base.Animal.describe",
        "pkga.base.Animal.speak",
        "pkga.util.shout",
        "pkgb.dog.Dog.roll",
        "pkgb.puppy.Puppy",
        "pkgb.puppy.Puppy.whine",
    }
