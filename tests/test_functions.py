"""Table-driven unit tests for the scalar name/path functions (D4–D10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codegraphdb_spark.functions.names import (
    module_name_from_path,
    module_name_to_path,
    parent_name,
    strip_prefix,
)


@pytest.mark.parametrize(
    "path,expected",
    [
        ("pkg/sub/mod.py", "pkg.sub.mod"),
        ("pkg/__init__.py", "pkg"),
        ("pkg/sub/__init__.py", "pkg.sub"),
        ("mod.py", "mod"),
        ("a/b/c/d.py", "a.b.c.d"),
    ],
)
def test_module_name_from_path(spark, path, expected):
    df = spark.createDataFrame([(path,)], "path STRING")
    assert df.select(module_name_from_path("path").alias("m")).first()["m"] == expected


@pytest.mark.parametrize(
    "module,expected",
    [("pkg.sub.mod", "pkg/sub/mod.py"), ("mod", "mod.py")],
)
def test_module_name_to_path(spark, module, expected):
    df = spark.createDataFrame([(module,)], "m STRING")
    assert df.select(module_name_to_path("m").alias("p")).first()["p"] == expected


@pytest.mark.parametrize(
    "name,expected",
    [
        ("pkg.mod.Class.method", "pkg.mod.Class"),
        ("pkg.mod", "pkg"),
        ("solo", None),
    ],
)
def test_parent_name(spark, name, expected):
    df = spark.createDataFrame([(name,)], "n STRING")
    assert df.select(parent_name("n").alias("p")).first()["p"] == expected


def test_strip_prefix(spark):
    df = spark.createDataFrame([("/repo/root/pkg/mod.py",)], "p STRING")
    got = df.select(strip_prefix(F.col("p"), "/repo/root").alias("s")).first()["s"]
    assert got == "pkg/mod.py"


def test_module_name_column_matches_extractor(spark):
    """ONE definition of the D4 path->module invariant: the Column twin
    must agree with the extractor's Python _module_name on every shape,
    including empty segments and nested __init__."""
    from pyspark.sql import functions as F

    from codegraphdb_spark.extract.ast_extract import _module_name
    from codegraphdb_spark.functions.names import module_name_from_path

    paths = [
        "pkg/sub/mod.py",
        "pkg/__init__.py",
        "pkg/sub/__init__.py",
        "mod.py",
        "a//b.py",
        "__init__.py",
    ]
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    got = {
        r["path"]: r["m"]
        for r in df.select("path", module_name_from_path("path").alias("m")).collect()
    }
    for p in paths:
        assert got[p] == _module_name(p), p
