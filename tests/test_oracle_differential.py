"""Oracle-differential test: every registered query with an oracle must
match DuckDB exactly (rowcount + columns + cell values) at sf0.001 —
the same gate the driver applies at sf0.01, run as part of the suite."""

from __future__ import annotations

import os

import duckdb
import pytest

from codegraphdb_spark import registry
from codegraphdb_spark.sources.tables import TABLES
from tools.check_oracle import compare

registry.load_all()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = registry.QUERIES[name](spark, sf_dir)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in registry.ORACLE:
        # rows-only contract: must run and return a well-formed result
        assert isinstance(spark_rows, list)
        return
    res = duck.execute(registry.ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
    assert not problems, f"{name}: {problems}"
