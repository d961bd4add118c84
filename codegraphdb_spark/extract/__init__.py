from codegraphdb_spark.extract.ast_extract import extract_facts

__all__ = ["extract_facts"]
