from codegraphdb_spark.functions.code_ptr import (
    encode_code_pointer,
    fold_code,
    hydrate_code,
    slice_dedent,
)
from codegraphdb_spark.functions.names import (
    module_name_from_path,
    module_name_to_path,
    parent_name,
)

__all__ = [
    "encode_code_pointer",
    "fold_code",
    "hydrate_code",
    "slice_dedent",
    "module_name_from_path",
    "module_name_to_path",
    "parent_name",
]
