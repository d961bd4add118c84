"""Local oracle-differential harness — a stricter stand-in for the driver's
CORRECTNESS check. For every registered query: run the Spark DataFrame and
the DuckDB oracle SQL on the same parquet fixtures, then compare

  * row count,
  * sorted column-name list,
  * cell-by-cell values after sorting rows by all columns (exact equality,
    including float bit-compare via repr) — stricter than any value hash.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from codegraphdb_spark import registry  # noqa: E402
from codegraphdb_spark.session import get_spark  # noqa: E402
from codegraphdb_spark.sources.tables import TABLES  # noqa: E402


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(normalize(x) for x in v)
    return v


def row_key(row):
    return tuple("\0" if v is None else str(normalize(v)) for v in row)


def compare(name: str, spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    problems = []
    if len(spark_rows) != len(duck_rows):
        problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    # align column order by sorted name
    s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
    d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_sorted = sorted([tuple(normalize(r[i]) for i in s_idx) for r in spark_rows], key=row_key)
    d_sorted = sorted([tuple(normalize(r[i]) for i in d_idx) for r in duck_rows], key=row_key)
    n_mismatch = 0
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        if sr != dr:
            n_mismatch += 1
            if n_mismatch <= 3:
                problems.append(f"row {i}: spark={sr} duck={dr}")
    if n_mismatch:
        problems.append(f"total mismatched rows: {n_mismatch}/{len(s_sorted)}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    registry.load_all()
    only = set(sys.argv[2:])
    unknown = only - set(registry.QUERIES)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    n_fail = 0
    for name, fn in sorted(registry.QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in registry.ORACLE:
            print(f"ROWS  {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(registry.ORACLE[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if problems:
            n_fail += 1
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"OK    {name}: {len(spark_rows)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
