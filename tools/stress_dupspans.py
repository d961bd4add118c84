"""Scale stress for exact duplicate-span detection
(queries/text.py::doc_dup_spans): a deterministic synthetic corpus orders
of magnitude past the fixture — unique md5-derived filler tokens with
boilerplate passages PLANTED into a known subset of documents — run
through the registered query, then

  1. verified structurally: every planted document reports a span
     covering its planted passage; no span lands in pure-filler ground
     (filler tokens are globally unique, so any unplanted span would be a
     pipeline bug, not a data accident);
  2. verified differentially: DuckDB recomputes the full span set from
     the same parquet via the query's own oracle SQL — the sf-fixture
     differential repeated at stress scale;
  3. timed: corpus build excluded, span pipeline wall time reported.

This is the evidence behind the operator's scale claim: the only
corpus-sized stage is one groupBy on 16-byte digests; everything after is
doc-local. Usage: python tools/stress_dupspans.py [n_docs] [dup_pct]
"""

from __future__ import annotations

import hashlib
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from codegraphdb_spark.session import get_spark  # noqa: E402

FILLER_LEN = 60  # tokens per document
PASSAGE = [f"boiler{j}" for j in range(24)]  # 24-token planted passage


def synth_docs(n_docs: int, dup_pct: int) -> list[tuple[int, str]]:
    """Every token is md5-unique to (doc, position) except the planted
    passage, inserted at a deterministic per-doc offset in every
    dup_pct-th document."""
    docs = []
    for i in range(n_docs):
        toks = [
            hashlib.md5(f"{i}:{p}".encode()).hexdigest()[:10]
            for p in range(FILLER_LEN)
        ]
        if i % (100 // dup_pct) == 0:
            off = 5 + (i % 20)
            toks[off : off + len(PASSAGE)] = PASSAGE
        docs.append((i, " ".join(toks)))
    return docs


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    dup_pct = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("stress-dupspans")
    spark.sparkContext.setLogLevel("ERROR")

    from codegraphdb_spark import registry
    from codegraphdb_spark.queries.text import DUP_SPAN_K

    registry.load_all()

    docs = synth_docs(n_docs, dup_pct)
    d = tempfile.mkdtemp(prefix="dupspan_stress_")
    spark.createDataFrame(docs, "doc_id BIGINT, text STRING").withColumn(
        "lang", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("en")
    ).selectExpr("doc_id", "text", "lang", "'srcX' AS source",
                 "CAST(length(text) AS BIGINT) AS n_chars").coalesce(8).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")

    t0 = time.time()
    rows = registry.QUERIES["doc_dup_spans"](spark, d).collect()
    wall = time.time() - t0

    planted = {i for i in range(n_docs) if i % (100 // dup_pct) == 0}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 1. every planted doc reports exactly its passage (one span, the
    # passage's token range; filler uniqueness forbids anything else)
    assert set(by_doc) == planted, (
        f"span docs != planted docs ({len(by_doc)} vs {len(planted)})"
    )
    for i in planted:
        off = 5 + (i % 20)
        spans = by_doc[i]
        assert len(spans) == 1, (i, spans)
        s = spans[0]
        assert s.span_start == off + 1 and s.span_tokens == len(PASSAGE), (i, s)
        assert s.n_dup_grams == len(PASSAGE) - DUP_SPAN_K + 1

    # 2. DuckDB differential at stress scale via the registered oracle
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{d}/documents.parquet/*.parquet')"
    )
    t1 = time.time()
    duck = con.execute(registry.ORACLE["doc_dup_spans"]).fetchall()
    duck_wall = time.time() - t1
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_dup_grams)
        for r in rows
    )
    assert got == sorted(tuple(r) for r in duck), "DuckDB differential FAILED"

    print(
        f"OK docs={n_docs} planted={len(planted)} spans={len(rows)} "
        f"spark={wall:.2f}s duckdb={duck_wall:.2f}s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
