"""Synthesize a K×-scaled fixture set from the driver's sf0.1 tables.

VERDICT r4 item 1 ("scale-regime execution proof"): every 100-TB claim in
PLANS.md had only been *plan-asserted* at SFs where all joins broadcast.
This tool manufactures the dataset that forces the other regime — K=10
over sf0.1 ≈ a TPC-H sf1 equivalent (6M lineitem rows) — so the catalog
can be *executed* with broadcasting disabled and the AQE-final plans
(sort-merge transition, skew splitting) captured from real runs.

Scaling is key-space replication, the same construction dbgen uses for
its own SF knob: replica ``i`` of a fact table shifts every synthetic key
by ``i * stride`` where ``stride = max(key)+1`` of the base table, so

  * per-replica referential integrity is exact (orders→customer,
    lineitem→orders/part/supplier all stay within replica ``i``),
  * join fan-outs and group cardinalities grow linearly with K (more
    groups, not deeper groups — the realistic growth mode),
  * the fixed dims (region/nation) stay fixed, exactly as TPC-H holds
    nations constant across SFs.

Non-key columns are perturbed deterministically where sameness would be a
lie at scale:

  * events keep their time RANGE but gain K× density (replica ts shifted
    by ``i*37s`` inside the window, user space offset) — windows/sessions
    get heavier, not longer;
  * documents: ~90% of replica docs get a replica-token prefix (novel
    text), ~10% stay byte-identical cross-replica dups so the dedup
    family has real work;
  * embeddings: replica vectors are cyclic rotations (norm-preserving,
    deterministic, no RNG) so ANN/cluster structure is re-shuffled rather
    than K× duplicated.

Everything runs AS Spark jobs (crossJoin with a broadcast replica index)
— the generator itself is the first scale test.

Usage: python tools/gen_scale.py [out_dir] [K] [base_sf_dir]
Defaults: /root/repo/testdata_sf1 10 /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from codegraphdb_spark.session import get_spark  # noqa: E402
from codegraphdb_spark.sources.tables import load_table  # noqa: E402

EMB_DIM = 64


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    base = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    spark = get_spark("gen-scale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    rep = F.broadcast(spark.range(k).withColumnRenamed("id", "__r"))

    def stride_of(df, key):
        return df.agg(F.max(key)).first()[0] + 1

    # fixed dims: byte-identical copies
    for t in ("region", "nation"):
        load_table(spark, base, t).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )

    cust = load_table(spark, base, "customer")
    supp = load_table(spark, base, "supplier")
    part = load_table(spark, base, "part")
    orders = load_table(spark, base, "orders")
    li = load_table(spark, base, "lineitem")
    s_cust = stride_of(cust, "c_custkey")
    s_supp = stride_of(supp, "s_suppkey")
    s_part = stride_of(part, "p_partkey")
    s_ord = stride_of(orders, "o_orderkey")

    def shift(col, stride):
        return (F.col(col) + F.col("__r") * F.lit(stride)).alias(col)

    def emit(df, name, parts, *cols):
        out = df.crossJoin(rep).select(*cols).repartition(parts)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {out.count()} rows (K={k})")

    emit(
        cust, "customer", 4,
        shift("c_custkey", s_cust),
        # replica customers get distinct names so name-keyed queries don't
        # silently dedup K× rows into one
        F.when(F.col("__r") == 0, F.col("c_name"))
        .otherwise(F.concat_ws("#", "c_name", "__r")).alias("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment",
    )
    emit(
        supp, "supplier", 1,
        shift("s_suppkey", s_supp),
        F.when(F.col("__r") == 0, F.col("s_name"))
        .otherwise(F.concat_ws("#", "s_name", "__r")).alias("s_name"),
        "s_nationkey", "s_acctbal",
    )
    emit(
        part, "part", 4,
        shift("p_partkey", s_part),
        F.when(F.col("__r") == 0, F.col("p_name"))
        .otherwise(F.concat_ws("#", "p_name", "__r")).alias("p_name"),
        "p_brand", "p_type", "p_size", "p_retailprice",
    )
    emit(
        orders, "orders", 8,
        shift("o_orderkey", s_ord),
        shift("o_custkey", s_cust),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    )
    emit(
        li, "lineitem", 32,
        shift("l_orderkey", s_ord),
        shift("l_partkey", s_part),
        shift("l_suppkey", s_supp),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    )

    ev = load_table(spark, base, "events")
    s_ev = stride_of(ev, "event_id")
    s_usr = stride_of(ev, "user_id")
    emit(
        ev, "events", 8,
        shift("event_id", s_ev),
        # K× density inside the same window: replica ts nudged 37s per
        # replica, far smaller than the fixture's multi-month span
        (F.col("ts") + F.make_interval(secs=F.col("__r") * 37)).alias("ts"),
        shift("user_id", s_usr),
        "event_type", "value", "props",
    )

    docs = load_table(spark, base, "documents")
    s_doc = stride_of(docs, "doc_id")
    # Replica text must be GENUINELY novel, or replication silently grows
    # near-dup clusters K× DEEPER instead of K× more numerous (the r5 wall
    # numbers measured exactly that: a one-token prefix left every base
    # trigram intact, so all K replicas of every doc were mutual near-dups
    # and the true answer itself grew quadratically). Suffixing every 3rd
    # token with a replica tag breaks EVERY trigram window across replicas
    # (each window contains ≥1 changed token, and the tag text differs per
    # replica), while shared windows WITHIN a replica transform identically
    # — so the base corpus's planted near-dup structure replicates per
    # replica: more clusters, not deeper clusters. A prepended replica
    # token guarantees byte-difference even for <3-token docs.
    # DELIBERATE residual depth: ~1% of docs (doc_id % 101 == 0) stay
    # byte-identical across replicas — deep K-sized clusters that keep the
    # engine's bounded-block caps and equal-set collapse honest without
    # letting depth dominate the corpus.
    deep = F.col("doc_id") % 101 == 0
    perturbed = F.concat_ws(
        " ",
        F.concat(F.lit("replica"), F.col("__r")),
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda tok, i: F.when(
                    i % 3 == F.col("__r") % 3,
                    F.concat(tok, F.lit("~r"), F.col("__r")),
                ).otherwise(tok),
            ),
        ),
    )
    new_text = F.when((F.col("__r") == 0) | deep, F.col("text")).otherwise(perturbed)
    emit(
        docs, "documents", 4,
        shift("doc_id", s_doc),
        new_text.alias("text"),
        "lang", "source",
        F.length(new_text).cast("long").alias("n_chars"),
    )

    emb = load_table(spark, base, "embeddings")
    s_vec = stride_of(emb, "vec_id")
    s_lbl = stride_of(emb, "label")
    rot = F.col("__r") % F.lit(EMB_DIM)
    emit(
        emb, "embeddings", 2,
        shift("vec_id", s_vec),
        F.concat(
            F.slice("embedding", rot + 1, F.lit(EMB_DIM) - rot),
            F.slice("embedding", F.lit(1), rot),
        ).alias("embedding"),
        # replica labels are DISTINCT blocks: K× more label blocks at the
        # base depth ("more groups"), matching how a real corpus grows.
        # Depth-robustness is the engine's job (tiled_block_pairs' hard
        # cap), proven separately by tools/stress_deepblock.py — not by
        # quietly making every fixture block 10× deeper.
        (F.col("label") + F.col("__r") * F.lit(s_lbl)).cast("int").alias("label"),
    )
    print(f"done → {out_dir}")


if __name__ == "__main__":
    main()
