"""PII masking as pure Column expressions (SURVEY §2.2 F8-F12).

Reference semantics (mask.go:23-66, golden values mask_test.go:20-72):
  - `default`: every [a-zA-Z0-9] char -> 'X'           ("555-66-7878" -> "XXX-XX-XXXX")
  - `partial`: mask all but the last 4 chars when len>4 ("555-66-7878" -> "XXX-XX-7878"),
               otherwise same as default
  - `hex`:     replace with a fresh 24-char ObjectId hex
  - non-string values pass through unchanged (mask.go:63-64)
  - dotted paths recurse into subdocuments (level2.ssn) and into each
    element of arrays-of-documents (array.ssn); paths that terminate on
    a non-string (e.g. a primitive array) leave it unchanged

Declared deviation (SURVEY §7): the reference's hex mask draws a *random*
ObjectId (mask.go:58); for reproducibility we emit the first 24 hex chars
of a salted SHA-256 of the value. Still 24 lowercase hex chars, still
non-reversible, but deterministic — testable against an oracle.

Everything is expression-only (regexp_replace / substring / transform /
withField): no Python UDFs, so masking stays inside whole-stage codegen
and costs one projection at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MASK_DEFAULT = "default"
MASK_PARTIAL = "partial"
MASK_HEX = "hex"
DEFAULT_HEX_SALT = "hummingbird"

_ALNUM = "[a-zA-Z0-9]"


def mask_value(col: Column, method: str = MASK_DEFAULT,
               salt: str = DEFAULT_HEX_SALT) -> Column:
    """Masking expression for one string column (mask.go:51-66)."""
    full = F.regexp_replace(col, _ALNUM, "X")
    if method == MASK_PARTIAL:
        partial = F.concat(
            F.regexp_replace(
                F.substring(col, 1, F.length(col) - F.lit(4)), _ALNUM, "X"
            ),
            F.substring(col, -4, 4),
        )
        return F.when(F.length(col) > 4, partial).otherwise(full)
    if method == MASK_HEX:
        return F.substring(F.sha2(F.concat(col, F.lit(salt)), 256), 1, 24)
    if method == MASK_DEFAULT:
        return full
    raise ValueError(f"unknown mask method {method!r}")


def _mask_in_type(col: Column, dtype: T.DataType, path: list[str],
                  method: str, salt: str) -> Column:
    """Rewrite `col` of type `dtype` so the field at `path` is masked.

    Mirrors maskDoc's traversal (mask.go:30-49): struct fields recurse,
    arrays of structs mask every element (higher-order `transform`),
    terminal strings get the mask, everything else passes through.
    """
    if not path:
        if isinstance(dtype, T.StringType):
            return mask_value(col, method, salt)
        return col  # non-string terminal: unchanged (mask.go:63-64)

    head, *rest = path
    if isinstance(dtype, T.StructType):
        names = {f.name: f.dataType for f in dtype.fields}
        if head not in names:
            return col
        inner = _mask_in_type(col[head], names[head], rest, method, salt)
        # withField preserves the remaining fields & their order
        return col.withField(head, inner)
    if isinstance(dtype, T.ArrayType) and isinstance(
        dtype.elementType, T.StructType
    ):
        elem_t = dtype.elementType
        return F.transform(
            col, lambda x: _mask_in_type(x, elem_t, path, method, salt)
        )
    return col


def mask_dataframe(df: DataFrame, fields: list[str],
                   method: str = MASK_DEFAULT,
                   salt: str = DEFAULT_HEX_SALT) -> DataFrame:
    """MaskFields (mask.go:23-28): apply one masking method to each
    dotted-path field of `df`. Schema-aware so non-string terminals and
    missing paths are no-ops, exactly like the reference's traversal."""
    out = df
    schema = {f.name: f.dataType for f in df.schema.fields}
    for field in fields:
        head, *rest = field.split(".")
        if head not in schema:
            continue
        masked = _mask_in_type(F.col(head), schema[head], rest, method, salt)
        out = out.withColumn(head, masked)
    return out
