"""HDR log-linear histogram: bucket mapping invariants (containment,
monotonicity, bounded relative error) over adversarial integer ranges,
quantile-bound correctness vs exact order statistics, and the
continuous twin's exact merge algebra (bit-identical to a from-scratch
build, replay no-op)."""

from __future__ import annotations

import json
import math
import os

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hummingbird_spark.operators.sketch import (
    hdr_bounds,
    hdr_bucket,
    hdr_build,
    hdr_quantiles,
)

S = 5


def _py_bucket(v: int, s: int = S) -> int:
    if v < (1 << s):
        return v
    e = v.bit_length() - 1
    return (e - s + 1) * (1 << s) + (v >> (e - s)) - (1 << s)


@given(st.lists(
    st.one_of(
        st.integers(min_value=0, max_value=70),
        st.integers(min_value=0, max_value=10**6),
        # boundary-adjacent values: 2^k - 1, 2^k, 2^k + 1
        st.integers(min_value=5, max_value=50).flatmap(
            lambda k: st.sampled_from([2**k - 1, 2**k, 2**k + 1])),
    ),
    min_size=1, max_size=40))
@settings(max_examples=25, deadline=None)
def test_bucket_mapping_invariants(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = (
        df.select("v", hdr_bucket(F.col("v"), S))
        .select("v", "bucket", *hdr_bounds(F.col("bucket"), S))
        .collect()
    )
    for r in rows:
        assert r.bucket == _py_bucket(r.v)
        assert r.lo <= r.v <= r.hi
        # relative error of the bucket's bounds
        if r.lo >= (1 << S):
            assert (r.hi - r.lo + 1) <= r.lo / (1 << (S - 1))
    # monotone: sorting by value sorts by bucket
    by_v = sorted(rows, key=lambda r: r.v)
    assert all(a.bucket <= b.bucket for a, b in zip(by_v, by_v[1:]))


def test_quantile_bounds_contain_exact(spark):
    vals = [int(17 + 13 * i + (i * i) % 997) * (1 + i % 7)
            for i in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.q: (r.lo, r.hi)
           for r in hdr_quantiles(df, "v", (0.1, 0.5, 0.9, 0.99), S)
           .collect()}
    ordered = sorted(vals)
    for q, (lo, hi) in got.items():
        exact = ordered[math.ceil(q * len(ordered)) - 1]
        assert lo <= exact <= hi
        if lo >= (1 << S):
            assert hi / lo <= 1 + 2 ** -(S - 1)


def test_continuous_hdr_bit_identical_and_replay(spark, tmp_path):
    from hummingbird_spark.streaming.sketch import (
        read_hist,
        start_continuous_hdr,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n", T.LongType()),
    ])
    rows = [(i, (i * 37) % 5000 + (i % 11) * 10000) for i in range(900)]
    src = str(tmp_path / "in")
    hist = str(tmp_path / "hist")
    os.makedirs(src)
    for b in range(3):
        with open(os.path.join(src, f"{b}.json"), "w") as fh:
            for doc_id, n in rows[b * 300:(b + 1) * 300]:
                fh.write(json.dumps({"doc_id": doc_id, "n": n}) + "\n")

    q = start_continuous_hdr(spark, src, hist, schema, "n", s=S)
    q.awaitTermination(180)

    batch = {(r.bucket, r.cnt) for r in hdr_build(
        spark.createDataFrame(rows, schema), "n", S).collect()}
    streamed = {(r.bucket, r.cnt)
                for r in read_hist(spark, hist).collect()}
    assert streamed == batch  # exact merge algebra, not approximately

    q = start_continuous_hdr(spark, src, hist, schema, "n", s=S)
    q.awaitTermination(180)
    again = {(r.bucket, r.cnt) for r in read_hist(spark, hist).collect()}
    assert again == batch  # ledger: replay is a no-op
