"""Re-export: the fixture lives in the package so the driver-facing graph
queries (codegraphdb_spark/queries/graph.py) can build it too."""

from codegraphdb_spark.mini_repo import (  # noqa: F401
    CHANGE_LIST,
    DEEP_V1,
    V1,
    V2,
    V2_CHANGED_ONLY,
)
