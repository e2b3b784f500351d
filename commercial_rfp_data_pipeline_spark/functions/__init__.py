from commercial_rfp_data_pipeline_spark.functions.scalar import (
    canonicalize_confirmed,
    hash_hex,
    multi_format_to_date,
    norm_ws,
    value_length,
)

__all__ = [
    "canonicalize_confirmed",
    "hash_hex",
    "multi_format_to_date",
    "norm_ws",
    "value_length",
]
