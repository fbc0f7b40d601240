"""Property-based tests for the Mongo-filter -> Column translator
(SURVEY §2.2 F1): hypothesis generates random datasets AND random filter
documents; Spark's filtered row-ids must equal a pure-Python reference
interpreter implementing the engine's documented semantics (SQL
three-valued logic; $exists == NULL-ness — the declared missing-vs-null
deviation, SURVEY §1.2).

The reference corpus only exercises a handful of literal filters
(quickstart.json, data-only.json); this is the exhaustive version the
Go reference gets for free by passing filters to MongoDB's own server.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from hummingbird_spark.filters import mongo_filter_to_column

SCHEMA = T.StructType([
    T.StructField("row_id", T.LongType(), False),
    T.StructField("i", T.LongType(), True),
    T.StructField("s", T.StringType(), True),
    T.StructField("a", T.ArrayType(T.LongType(), False), True),
])

# ---------------------------------------------------------------------------
# Reference interpreter (Kleene 3VL; None = SQL NULL / unknown)
# ---------------------------------------------------------------------------


def _and3(values):
    if any(v is False for v in values):
        return False
    if any(v is None for v in values):
        return None
    return True


def _or3(values):
    if any(v is True for v in values):
        return True
    if any(v is None for v in values):
        return None
    return False


def _not3(v):
    return None if v is None else (not v)


def _java_rem(a: int, d: int) -> int:
    # Spark's % is Java remainder (sign of the dividend)
    return a - int(a / d) * d


def _eval_op(val, op, arg):
    if op == "$exists":
        return (val is not None) if arg else (val is None)
    if op == "$not":
        return _not3(_eval_spec(val, arg))
    if val is None:
        return None
    if op == "$eq":
        return val == arg
    if op == "$ne":
        return val != arg
    if op == "$gt":
        return val > arg
    if op == "$gte":
        return val >= arg
    if op == "$lt":
        return val < arg
    if op == "$lte":
        return val <= arg
    if op == "$in":
        return val in arg
    if op == "$nin":
        return val not in arg
    if op == "$regex":
        return re.search(arg, val) is not None
    if op == "$mod":
        return _java_rem(val, int(arg[0])) == int(arg[1])
    if op == "$size":
        return len(val) == int(arg)
    if op == "$all":
        return _and3([x in val for x in arg])
    if op == "$elemMatch":
        return _or3([_eval_spec(e, arg) for e in val]) if val else False
    raise AssertionError(op)


def _eval_spec(val, spec):
    if isinstance(spec, dict):
        return _and3([_eval_op(val, op, arg) for op, arg in spec.items()])
    return _eval_op(val, "$eq", spec)


def eval_filter(doc: dict, row: dict):
    conds = []
    for key, spec in doc.items():
        if key == "$and":
            conds.append(_and3([eval_filter(d, row) for d in spec]))
        elif key == "$or":
            conds.append(_or3([eval_filter(d, row) for d in spec]))
        elif key == "$nor":
            conds.append(_not3(_or3([eval_filter(d, row) for d in spec])))
        else:
            conds.append(_eval_spec(row.get(key), spec))
    return _and3(conds)


# ---------------------------------------------------------------------------
# Strategies
# ---------------------------------------------------------------------------

ints = st.integers(-50, 50)
strs = st.text(alphabet="abc", max_size=4)
arrs = st.lists(st.integers(0, 5), max_size=4)

rows = st.lists(
    st.fixed_dictionaries({
        "i": st.none() | ints,
        "s": st.none() | strs,
        "a": st.none() | arrs,
    }),
    min_size=10, max_size=40,
)

cmp_ops = st.sampled_from(["$eq", "$ne", "$gt", "$gte", "$lt", "$lte"])

leaf_i = st.one_of(
    st.builds(lambda v: {"i": v}, ints),
    st.builds(lambda op, v: {"i": {op: v}}, cmp_ops, ints),
    st.builds(lambda vs: {"i": {"$in": vs}},
              st.lists(ints, min_size=1, max_size=5)),
    st.builds(lambda vs: {"i": {"$nin": vs}},
              st.lists(ints, min_size=1, max_size=5)),
    st.builds(lambda b: {"i": {"$exists": b}}, st.booleans()),
    st.builds(lambda d, r: {"i": {"$mod": [d, r]}},
              st.integers(1, 7), st.integers(0, 6)),
    st.builds(lambda lo, hi: {"i": {"$gte": lo, "$lte": hi}}, ints, ints),
)
leaf_s = st.one_of(
    st.builds(lambda v: {"s": v}, strs),
    st.builds(lambda v: {"s": {"$regex": v}},
              st.text(alphabet="abc", min_size=1, max_size=2)),
    st.builds(lambda vs: {"s": {"$in": vs}},
              st.lists(strs, min_size=1, max_size=4)),
    st.builds(lambda b: {"s": {"$exists": b}}, st.booleans()),
)
leaf_a = st.one_of(
    st.builds(lambda n: {"a": {"$size": n}}, st.integers(0, 4)),
    st.builds(lambda vs: {"a": {"$all": vs}},
              st.lists(st.integers(0, 5), min_size=1, max_size=3)),
    st.builds(lambda op, v: {"a": {"$elemMatch": {op: v}}},
              cmp_ops, st.integers(0, 5)),
)
leaf = st.one_of(leaf_i, leaf_s, leaf_a)

filters = st.recursive(
    leaf,
    lambda children: st.one_of(
        st.builds(lambda fs: {"$and": fs},
                  st.lists(children, min_size=1, max_size=3)),
        st.builds(lambda fs: {"$or": fs},
                  st.lists(children, min_size=1, max_size=3)),
        st.builds(lambda fs: {"$nor": fs},
                  st.lists(children, min_size=1, max_size=3)),
        st.builds(lambda a, b: {**a, **b}, leaf_i, leaf_s),  # top-level AND
    ),
    max_leaves=4,
)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=rows, doc=filters)
def test_translator_matches_reference_semantics(spark, data, doc):
    tagged = [
        {"row_id": idx, **row} for idx, row in enumerate(data)
    ]
    df = spark.createDataFrame(tagged, SCHEMA)
    got = {r.row_id for r in
           df.filter(mongo_filter_to_column(doc)).select("row_id").collect()}
    want = {row["row_id"] for row in tagged
            if eval_filter(doc, row) is True}
    assert got == want, f"filter {doc!r}: spark={sorted(got)} ref={sorted(want)}"
