from hummingbird_spark.streaming.cdc import (
    OPLOG_SCHEMA,
    apply_cdc_batch,
    decode_write_models,
    reduce_write_models,
    start_cdc_stream,
)
from hummingbird_spark.streaming.oplog import (
    namespace_match_column,
    skip_oplog,
    unnest_apply_ops,
)

__all__ = [
    "OPLOG_SCHEMA",
    "decode_write_models",
    "reduce_write_models",
    "apply_cdc_batch",
    "start_cdc_stream",
    "skip_oplog",
    "unnest_apply_ops",
    "namespace_match_column",
]
