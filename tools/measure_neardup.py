"""Measure wall + output cardinality of the near-dup family at two SFs.

Grounds the bounded-block work (VERDICT r5 item 2): is the sf0.1->sf1 wall
growth quadratic SCORING work (fixable) or quadratic TRUE OUTPUT (inherent
to the planted-dup fixture)?  Run before and after the kernel changes.

Usage: python tools/measure_neardup.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from codegraphdb_spark.session import clear_session_caches, get_spark  # noqa: E402
from codegraphdb_spark import registry  # noqa: E402
import __spark_entry__  # noqa: E402,F401 — populate the registry

QUERIES = sys.argv[1:] or [
    "emb_near_dup_pairs",
    "doc_semantic_dedup",
    "simhash_near_dup_pairs",
    "doc_containment_pairs",
]

SFS = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/root/repo/testdata_sf1")]


def main() -> None:
    spark = get_spark("measure-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_name, sf_dir in SFS:
        for q in QUERIES:
            clear_session_caches(spark)  # cold per measurement
            t0 = time.time()
            n = len(registry.QUERIES[q](spark, sf_dir).collect())
            print(f"{sf_name:7s} {q:28s} rows={n:>9,d}  wall={time.time()-t0:7.2f}s", flush=True)


if __name__ == "__main__":
    main()
