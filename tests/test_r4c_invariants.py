"""Property/invariant tests for the r4c operators — semantic guarantees
the oracle differential can't express (it checks equality, not algebra).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark import registry


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_ewma_of_constant_series_is_the_constant(spark):
    """Weights normalize: a constant series EWMAs to itself exactly at
    every row, whatever the lag-window fill state."""
    rows = [(i, 1, f"2024-01-01 00:{i:02d}:00", "t", 7.25) for i in range(12)]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts STRING, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # run the registered query unchanged against a synthetic events dir
    import tempfile

    d = tempfile.mkdtemp(prefix="ewma_const_")
    df.withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    res = registry.QUERIES["events_ewma"](spark, d).collect()
    assert len(res) == 12
    assert all(abs(r["ewma"] - 7.25) < 1e-12 for r in res)


def test_twa_of_constant_series_is_the_constant(spark):
    import tempfile

    rows = [(i, 1, f"2024-01-01 0{i % 10}:03:0{i % 6}", "t", 3.5) for i in range(8)]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts STRING, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp")).withColumn("props", F.lit("{}"))
    d = tempfile.mkdtemp(prefix="twa_const_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    res = registry.QUERIES["events_time_weighted_avg"](spark, d).collect()
    assert res
    assert all(abs(r["twa"] - 3.5) < 1e-12 for r in res)


def test_ohlc_ordering_invariants(spark, sf_dir):
    """low ≤ open,close ≤ high on every bar; tick counts conserve."""
    bars = registry.QUERIES["events_ohlc_bars"](spark, sf_dir).collect()
    assert bars
    for r in bars:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
    from codegraphdb_spark.sources.tables import load_table

    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_ticks"] for r in bars) == total


def test_novelty_conserves_distinct_shingles(spark, sf_dir):
    """Every distinct shingle is novel exactly once: Σ n_novel over docs
    equals the corpus's distinct-shingle count."""
    rows = registry.QUERIES["doc_shingle_novelty"](spark, sf_dir).collect()
    assert rows
    assert rows[0]["novelty"] == 1.0  # the first document is all-novel
    # recompute the distinct-shingle universe through the same helper
    from codegraphdb_spark.queries.text import _pair_overlap_uncached  # noqa: F401
    import hashlib

    from codegraphdb_spark.sources.tables import load_table

    seen = set()
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        toks = r["text"].split(" ")
        if len(toks) >= 3:
            shingles = {
                f"{toks[i]} {toks[i + 1]} {toks[i + 2]}" for i in range(len(toks) - 2)
            }
        else:
            shingles = {r["text"]}
        seen |= {int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in shingles}
    assert sum(r["n_novel"] for r in rows) == len(seen)


def test_containment_bounds_and_consistency(spark, sf_dir):
    rows = registry.QUERIES["doc_containment_pairs"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r["cont_a"] <= 1.0 and 0 < r["cont_b"] <= 1.0
        assert max(r["cont_a"], r["cont_b"]) >= 0.5  # the keep-cut
