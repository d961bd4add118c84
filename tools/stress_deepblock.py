"""Adversarial deep-block stress for tiled_block_pairs (VERDICT r5 item 2).

gen_scale v2 grows fixtures in block COUNT (the realistic mode), so the
depth-robustness claim needs its own adversary: ONE label holding the whole
corpus — the shape that OOMed the r5 kernel at 2,180 deep and would be a
guaranteed executor kill at 10× that. This tool builds a single 20,000-deep
block (≈40 tiles at the default cap), runs the tiled kernel, and verifies:

  1. completion with bounded per-task tiles (the kernel's hard-cap assert
     stays silent);
  2. EXACT equality against a chunked driver-side numpy brute force using
     the same input-rounded integer convention — every pair, every cosine
     bit;
  3. tiling actually engaged (nsb > 1 — the test is vacuous otherwise).

Usage: python tools/stress_deepblock.py [depth]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from codegraphdb_spark.operators.similarity import (  # noqa: E402
    BLOCK_PAIR_CAP,
    PAIR_INT_SCALE,
    tiled_block_pairs,
)
from codegraphdb_spark.session import get_spark  # noqa: E402

DIM = 64
THRESHOLD = 0.38


def brute_pairs(m: np.ndarray, threshold: float) -> dict:
    """Chunked exact brute force with the kernel's integer convention."""
    q = np.trunc(m * PAIR_INT_SCALE + np.copysign(0.5, m))
    nrm = np.sqrt((q * q).sum(axis=1))
    out = {}
    chunk = 2048
    n = len(q)
    for s in range(0, n, chunk):
        rows = q[s : s + chunk]
        dots = rows @ q.T  # (chunk, n)
        cos = dots / (nrm[s : s + chunk, None] * nrm[None, :])
        ia, ib = np.nonzero(cos >= threshold)
        for a, b in zip(ia, ib):
            ga = s + a
            if ga < b:
                out[(ga, int(b))] = cos[a, b]
    return out


def main() -> int:
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    rng = np.random.default_rng(11)
    m = rng.normal(size=(depth, DIM)) / np.sqrt(DIM)
    # plant dup structure: 2% of rows are near-copies of earlier rows, so
    # the answer is non-trivial and clusters cross tile boundaries
    n_dup = depth // 50
    src = rng.integers(0, depth // 2, size=n_dup)
    dst = depth // 2 + rng.integers(0, depth // 2, size=n_dup)
    m[dst] = m[src] + rng.normal(size=(n_dup, DIM)) * 0.02

    nsb = max(1, -(-2 * depth // BLOCK_PAIR_CAP))
    assert nsb > 1, "depth too shallow — tiling would not engage"
    print(f"depth={depth}  cap={BLOCK_PAIR_CAP}  sub-blocks={nsb}  "
          f"tiles={(nsb * nsb + nsb) // 2}")

    spark = get_spark("stress-deepblock")
    spark.sparkContext.setLogLevel("ERROR")
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(depth, dtype=np.int64),
            "label": np.int32(0),
            "e": [row.tolist() for row in m],
        }
    )
    v = spark.createDataFrame(pdf)
    t0 = time.time()
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tiled_block_pairs(
            v, block_col="label", id_col="vec_id", vec_col="e",
            threshold=THRESHOLD,
        ).collect()
    }
    t_spark = time.time() - t0
    t0 = time.time()
    want = brute_pairs(m, THRESHOLD)
    t_brute = time.time() - t0

    missing = set(want) - set(got)
    extra = set(got) - set(want)
    value_bad = [k for k in want if k in got and got[k] != want[k]]
    print(f"pairs: tiled={len(got):,} brute={len(want):,}  "
          f"missing={len(missing)} extra={len(extra)} value_mismatch={len(value_bad)}")
    print(f"wall: tiled(32 threads)={t_spark:.1f}s  brute(1 thread)={t_brute:.1f}s")
    if missing or extra or value_bad:
        for k in list(missing)[:3]:
            print("  missing", k, want[k])
        for k in list(extra)[:3]:
            print("  extra", k, got[k])
        for k in value_bad[:3]:
            print("  value", k, got[k], want[k])
        print("FAIL")
        return 1
    print("OK — deep block tiled exactly")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
