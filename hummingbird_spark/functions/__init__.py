from hummingbird_spark.functions.ejson import normalize_extended_json
from hummingbird_spark.functions.masks import (
    MASK_DEFAULT,
    MASK_HEX,
    MASK_PARTIAL,
    mask_dataframe,
    mask_value,
)
from hummingbird_spark.functions.scalars import (
    extended_json,
    redacted_uri,
    to_float64,
    to_int32,
    to_int64,
)

__all__ = [
    "MASK_DEFAULT",
    "MASK_PARTIAL",
    "MASK_HEX",
    "mask_value",
    "mask_dataframe",
    "redacted_uri",
    "to_float64",
    "to_int32",
    "to_int64",
    "extended_json",
    "normalize_extended_json",
]
