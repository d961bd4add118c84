"""Guard for the round-5 red-row class: every registered query's RESULT
schema must be scalar-only at the top level — the correctness harness
canonicalizes results through a pandas sort, and list/map cells are
unhashable there (emb_whiten failed exactly this way in r5 and
grouped_collect_sorted nearly did in r1). Building the DataFrames is lazy;
only the handful of hybrid queries run probe jobs."""

from __future__ import annotations

from pyspark.sql import types as T

from codegraphdb_spark import registry
import __spark_entry__  # noqa: F401 — populate the registry

SF = "/root/testdata/sf0.001"


def test_all_query_schemas_are_scalar_only(spark):
    offenders = []
    for name, fn in registry.QUERIES.items():
        df = fn(spark, SF)
        for field in df.schema.fields:
            if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
                offenders.append(f"{name}: {field.name} {field.dataType.simpleString()}")
    assert not offenders, offenders
