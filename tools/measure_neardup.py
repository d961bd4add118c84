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

QUERIES = [
    "emb_near_dup_pairs",
    "doc_semantic_dedup",
    "simhash_near_dup_pairs",
    "doc_containment_pairs",
]

SFS = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/root/repo/testdata_sf1")]


def main() -> None:
    # fixtures are overridable as tag:dir args (e.g. a K=100 set from
    # gen_scale), so the same harness produces every growth record:
    #   python tools/measure_neardup.py sf0.1:/root/testdata/sf0.1 \
    #          k100:/root/repo/testdata_sf10 [--json out.json] [query ...]
    import json

    sfs = list(SFS)
    queries = list(QUERIES)
    json_out = None
    args = sys.argv[1:]
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):  # ADVICE r7: trailing --json crashed
            sys.exit("usage: measure_neardup.py [tag:dir ...] "
                     "[--json OUT.json] [query ...]")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    pairs = [a for a in args if ":" in a]
    names = [a for a in args if ":" not in a]
    if pairs:
        sfs = [tuple(a.split(":", 1)) for a in pairs]
    if names:
        queries = names

    spark = get_spark("measure-neardup")
    spark.sparkContext.setLogLevel("ERROR")
    record: dict = {"fixtures": dict(sfs), "queries": {}}
    for q in queries:
        record["queries"][q] = {}
        for sf_name, sf_dir in sfs:
            clear_session_caches(spark)  # cold per measurement
            t0 = time.time()
            # hash(*) forces every output column to be COMPUTED (a bare
            # count() lets Catalyst prune projection-only work — e.g. a
            # window query with no filter collapses to the input count),
            # while keeping the driver transfer at one row
            row = (
                registry.QUERIES[q](spark, sf_dir)
                .selectExpr("count(1) AS n", "sum(hash(*)) AS h")
                .first()
            )
            n = row["n"]
            w = round(time.time() - t0, 2)
            record["queries"][q][sf_name] = {"rows": n, "wall_sec": w}
            print(
                f"{sf_name:7s} {q:28s} rows={n:>11,d}  wall={w:7.2f}s",
                flush=True,
            )
        walls = [v["wall_sec"] for v in record["queries"][q].values()]
        if len(walls) == 2 and walls[0] > 0:
            record["queries"][q]["wall_ratio"] = round(walls[1] / walls[0], 2)
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
