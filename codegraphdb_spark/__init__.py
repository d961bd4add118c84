"""codegraphdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference code-graph database
(laptype/codeGraphDB), re-expressed Spark-first.

Two system-of-record DataFrames — ``nodes`` and ``edges`` (see
``codegraphdb_spark.datamodel``) — replace the reference's Neo4j property
graph (reference: graphDB.py:72-153). All graph construction is set-oriented
merge jobs (no locks, no point writes); the query surface is ``spark.sql``
over registered views plus the helper library in ``codegraphdb_spark.queries``.

Extension operators for large-scale training-data pipelines (dedup,
similarity search, text analysis, multimodal plumbing, streaming) live in
``codegraphdb_spark.operators`` and ``codegraphdb_spark.streaming``.
"""

__version__ = "0.1.0"
