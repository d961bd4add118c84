"""Sweep every registered query's RESULT SCHEMA for top-level ARRAY / MAP /
STRUCT columns.

The driver's correctness harness canonicalizes both the Spark and the DuckDB
result through a pandas sort over every column; list/dict cells are
unhashable there, so a query returning a top-level complex column red-flags
the moment it rotates into the 50-query window (this killed ``emb_whiten``
in round 5 — CORRECTNESS_r05 ``unhashable type: 'list'`` — exactly the way
it nearly killed ``grouped_collect_sorted`` in round 1).

Usage::

    python tools/schema_sweep.py [sf_dir]

Exits non-zero and lists offenders if any query's schema contains a complex
top-level column.  Building the DataFrame is lazy — no jobs run except for
the handful of hybrid queries that probe the data while planning.
"""

from __future__ import annotations

import sys

from pyspark.sql import types as T

sys.path.insert(0, "/root/repo")

from codegraphdb_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("schema-sweep")
    offenders: list[tuple[str, str]] = []
    qs = entrymod.queries()
    for name, fn in qs.items():
        try:
            df = fn(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            print(f"BUILD-ERR {name}: {exc}")
            offenders.append((name, f"build error: {exc}"))
            continue
        for field in df.schema.fields:
            if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
                offenders.append((name, f"{field.name}: {field.dataType.simpleString()}"))
    if offenders:
        print(f"\n{len(offenders)} offending column(s):")
        for name, desc in offenders:
            print(f"  {name}  ->  {desc}")
        return 1
    print(f"\nOK: all {len(qs)} query schemas are scalar-only at the top level")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
