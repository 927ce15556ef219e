from mapreduce_spark.functions.encode import (
    enc_component_col,
    enc_key_cols,
    json_scalar_col,
)

__all__ = ["enc_component_col", "enc_key_cols", "json_scalar_col"]
