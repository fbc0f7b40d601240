"""Masking golden tests — values verbatim from the reference's
mask_test.go:20-72 (doc fixture mask_test.go:12-18)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from hummingbird_spark.functions.masks import (
    MASK_DEFAULT,
    MASK_HEX,
    MASK_PARTIAL,
    mask_dataframe,
)

DOC = Row(
    ssn="555-66-7878",
    level2=Row(ssn="555-66-7878"),
    array=[Row(ssn="555-66-7878"), Row(ssn="555-66-7878")],
    strings=["a", "b", "c"],
    numbers=[1, 2, 3],
)


def _df(spark):
    return spark.createDataFrame([DOC])


def test_mask_default(spark):
    # mask_test.go:26
    row = mask_dataframe(_df(spark), ["ssn"], MASK_DEFAULT).first()
    assert row.ssn == "XXX-XX-XXXX"


def test_mask_subdocument(spark):
    # mask_test.go:35
    row = mask_dataframe(_df(spark), ["level2.ssn"], MASK_DEFAULT).first()
    assert row.level2.ssn == "XXX-XX-XXXX"
    assert row.ssn == "555-66-7878"  # untouched sibling


def test_mask_document_array(spark):
    # mask_test.go:44-46
    row = mask_dataframe(_df(spark), ["array.ssn"], MASK_DEFAULT).first()
    assert [e.ssn for e in row.array] == ["XXX-XX-XXXX", "XXX-XX-XXXX"]


def test_mask_primitive_array_untouched(spark):
    # mask_test.go:55 — path terminating on a non-string is a no-op
    row = mask_dataframe(_df(spark), ["strings"], MASK_DEFAULT).first()
    assert row.strings == ["a", "b", "c"]
    row = mask_dataframe(_df(spark), ["numbers"], MASK_DEFAULT).first()
    assert row.numbers == [1, 2, 3]


def test_mask_partial(spark):
    # mask_test.go:65
    row = mask_dataframe(_df(spark), ["ssn"], MASK_PARTIAL).first()
    assert row.ssn == "XXX-XX-7878"


def test_mask_partial_short_string_full_mask(spark):
    # mask.go:54: len<=4 falls through to default full mask
    df = spark.createDataFrame([Row(ssn="ab1")])
    row = mask_dataframe(df, ["ssn"], MASK_PARTIAL).first()
    assert row.ssn == "XXX"


def test_mask_hex_is_24_hex_and_deterministic(spark):
    # mask_test.go:71 (length); determinism is our declared deviation
    df = spark.createDataFrame([Row(ssn="555-66-7878")])
    a = mask_dataframe(df, ["ssn"], MASK_HEX).first().ssn
    b = mask_dataframe(df, ["ssn"], MASK_HEX).first().ssn
    assert len(a) == 24
    assert a == b
    assert all(c in "0123456789abcdef" for c in a)


def test_mask_missing_field_noop(spark):
    df = spark.createDataFrame([Row(ssn="x")])
    row = mask_dataframe(df, ["nope", "nope.deep"], MASK_DEFAULT).first()
    assert row.ssn == "x"


def test_mask_non_string_terminal_noop(spark):
    df = spark.createDataFrame([Row(n=42)])
    assert mask_dataframe(df, ["n"], MASK_DEFAULT).first().n == 42


def test_mask_stays_expression_only(spark):
    """No Python UDF in the plan — masking must stay codegen-able."""
    df = mask_dataframe(_df(spark), ["ssn", "level2.ssn", "array.ssn"],
                        MASK_DEFAULT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
