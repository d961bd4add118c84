"""Property-graph data model (SURVEY.md §1.5).

Two system-of-record DataFrames replace the reference's Neo4j graph
(nodes/edges with dynamic property dicts, graphDB.py:72-153):

- ``nodes``: one row per symbol, keyed by ``full_name`` (the dotted Python
  identity, reference graphDB.py:65-70). The reference's multi-label
  version stamping (task_id labels, graphDB.py:75-78) becomes a
  ``versions ARRAY<STRING>`` column; label match becomes
  ``array_contains(versions, v)``.
- ``edges``: typed directed edges keyed by (src, dst, rel_type)
  (reference add_edge graphDB.py:133-153).

The lazy ``<CODE>`` body pointer (myClient.py:46-48) is a first-class
struct (code_file, code_start, code_end) hydrated at render time
(functions/code_ptr.py).

Scale layout: snapshots are written partitioned by ``kind`` (7 values →
stable partition pruning for label-filtered queries, the reference's C2
shape) and sorted by ``full_name`` within files so point lookups prune row
groups via min/max stats.
"""

from __future__ import annotations

from pyspark.sql import types as T

KINDS = ("MODULE", "CLASS", "FUNCTION", "METHOD", "GLOBAL_VARIABLE", "FIELD", "none")

EDGE_TYPES = ("CONTAINS", "HAS_METHOD", "HAS_FIELD", "CALL", "USES", "INHERITS")

# Sentinel for names the resolver cannot bind (reference index_utils.py:62
# maps unresolvable names to 'unsolved symbol').
UNSOLVED = "unsolved symbol"

NODES_SCHEMA = T.StructType(
    [
        T.StructField("full_name", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("class", T.StringType(), True),
        T.StructField("signature", T.StringType(), True),
        T.StructField("code_file", T.StringType(), True),
        T.StructField("code_start", T.IntegerType(), True),
        T.StructField("code_end", T.IntegerType(), True),
        T.StructField("versions", T.ArrayType(T.StringType()), False),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("rel_type", T.StringType(), False),
        T.StructField("association_type", T.StringType(), True),
        T.StructField("versions", T.ArrayType(T.StringType()), False),
    ]
)

# Raw extraction facts (one unioned schema; split by `fact` downstream).
FACTS_SCHEMA = T.StructType(
    [
        T.StructField("fact", T.StringType(), False),  # node|edge|import|ref|assign|returns|error
        T.StructField("full_name", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("class", T.StringType(), True),
        T.StructField("signature", T.StringType(), True),
        T.StructField("code_file", T.StringType(), True),
        T.StructField("code_start", T.IntegerType(), True),
        T.StructField("code_end", T.IntegerType(), True),
        T.StructField("dst", T.StringType(), True),  # edge dst / ref target expr
        T.StructField("association_type", T.StringType(), True),
        T.StructField("module", T.StringType(), True),  # owning module full_name
        T.StructField("imp_target_module", T.StringType(), True),
        T.StructField("imp_target_name", T.StringType(), True),
        T.StructField("imp_alias", T.StringType(), True),
        T.StructField("imp_is_star", T.BooleanType(), True),
    ]
)

FILES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),  # repo-relative
        T.StructField("content", T.StringType(), False),
    ]
)
