"""tiled_block_pairs: the bounded-block exact pair kernel (VERDICT r5 #2).

A block deeper than the cap must be hash-split into tiles, scored tile-by-tile,
and still produce EXACTLY the all-pairs result — same pairs, same cosines,
no duplicates, no misses — as a single brute-force numpy pass using the same
input-rounded integer convention.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.operators.similarity import (
    PAIR_INT_SCALE,
    tiled_block_pairs,
)


def _brute(ids: np.ndarray, m: np.ndarray, threshold: float):
    q = np.trunc(m * PAIR_INT_SCALE + np.copysign(0.5, m))
    dots = q @ q.T
    nrm = np.sqrt((q * q).sum(axis=1))
    cos = dots / (nrm[:, None] * nrm[None, :])
    ia, ib = np.triu_indices(len(m), k=1)
    keep = cos[ia, ib] >= threshold
    return {
        (int(ids[a]), int(ids[b])): cos[a, b]
        for a, b in zip(ia[keep], ib[keep])
    }


@pytest.mark.parametrize("depth,cap", [(300, 64), (50, 1024)])
def test_tiled_matches_brute_force(spark, depth, cap):
    """Deep block (tiling engaged, nsb ≈ 2·depth/cap tiles) and shallow block
    (single tile) both reproduce brute force exactly."""
    rng = np.random.default_rng(7)
    dim = 16
    m = rng.normal(size=(depth, dim)) / np.sqrt(dim)
    # plant near-dup structure so the threshold keeps a nontrivial pair set
    m[1] = m[0] + rng.normal(size=dim) * 0.01
    m[2] = m[0] * 0.9
    ids = np.arange(depth, dtype=np.int64)
    pdf = pd.DataFrame(
        {"vec_id": ids, "label": 1, "e": [row.tolist() for row in m]}
    )
    v = spark.createDataFrame(pdf).select(
        "vec_id", F.col("label").cast("int").alias("label"),
        F.col("e").cast("array<double>").alias("e"),
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tiled_block_pairs(
            v, block_col="label", id_col="vec_id", vec_col="e",
            threshold=0.5, cap=cap,
        ).collect()
    }
    want = _brute(ids, m, 0.5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], f"cosine mismatch at {k}"
    assert len(want) >= 3  # the planted structure actually fired


def test_blocks_do_not_mix(spark):
    """Pairs never cross blocks, even when tiling splits within blocks."""
    rng = np.random.default_rng(3)
    dim = 8
    m = rng.normal(size=(120, dim))
    m[::2] = m[0]  # strong within-data duplication
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(120, dtype=np.int64),
            "label": (np.arange(120) % 4).astype("int32"),
            "e": [row.tolist() for row in m],
        }
    )
    v = spark.createDataFrame(pdf)
    out = tiled_block_pairs(
        v, block_col="label", id_col="vec_id", vec_col="e",
        threshold=0.9, cap=16,
    ).collect()
    assert len(out) > 0
    for r in out:
        assert r["id_a"] % 4 == r["id_b"] % 4 == r["block"]
        assert r["id_a"] < r["id_b"]
    # no duplicate pairs across tiles
    keys = [(r["id_a"], r["id_b"]) for r in out]
    assert len(keys) == len(set(keys))


def test_partitioning_invariance(spark):
    """The pair set and every cosine must be IDENTICAL no matter how the
    input is partitioned: sub-block assignment derives from xxhash64 of
    the row id (content, not placement), and the integer-dgemm sums are
    exact, so neither task boundaries nor summation order can leak into
    the result."""
    rng = np.random.default_rng(5)
    dim = 12
    m = rng.normal(size=(200, dim)) / np.sqrt(dim)
    m[1::3] = m[0] + rng.normal(size=dim) * 0.02
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(200, dtype=np.int64),
            "label": np.int32(0),
            "e": [row.tolist() for row in m],
        }
    )
    outs = []
    for nparts in (1, 7, 64):
        v = spark.createDataFrame(pdf).repartition(nparts)
        outs.append(
            sorted(
                (r["id_a"], r["id_b"], r["cosine"])
                for r in tiled_block_pairs(
                    v, block_col="label", id_col="vec_id", vec_col="e",
                    threshold=0.6, cap=32,
                ).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) > 50  # the planted structure actually fired


def test_exactness_guard_fires(spark):
    """Components large enough to break the 2^53 exactness bound must raise
    loudly, never silently lose integer exactness."""
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(4, dtype=np.int64),
            "label": np.int32(0),
            "e": [[1e3] * 64] * 4,  # 1e3·1e7 = 1e10; 64·1e20 >> 2^53
        }
    )
    v = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="2\\^53"):
        tiled_block_pairs(
            v, block_col="label", id_col="vec_id", vec_col="e",
            threshold=0.5,
        ).collect()
