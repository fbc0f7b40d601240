"""Distributed training for the hashed-bag quality classifier — the
step `functions/text.py::hashed_classifier_score` leaves open ("swap
in trained weights"): full-batch logistic regression over hashed token
features (the fastText-style model CCNet / RefinedWeb quality filters
use), trained with QUANTIZED-GRADIENT descent so the whole trajectory
is partition-invariant and engine-exact, the same discipline as
`operators/cluster.py`'s integer k-means.

Why quantized gradients: a naive float gradient is a SUM of per-doc
double contributions — its value depends on aggregation order, so two
partitionings (or two engines) diverge in the last ulp and the
divergence compounds across iterations. Here every cross-row sum is
an INTEGER sum:

  weights live in 1e-6-scaled integer space (W, bias B0);
  z_d   = (sum_b cnt_db * W_b + len_d * B0) / (len_d * 1e6)
          — integer dot product (exact, order-free), ONE float
          division per doc;
  p_d   = round(sigmoid(z_d), 6)       — the only libm call; 6-dp
          rounding keeps the 1-ulp Java-vs-libm exp() divergence from
          ever reaching a stored value;
  R_d   = round((y_d - p_d) * 1e6)     — integer residual (exact:
          y - p is a 1e-6 multiple after the rounding above);
  G_b   = sum_d round(cnt_db * R_d / len_d)  — per-cell round to
          integer, then an exact integer sum (tf-normalized gradient
          in 1e-6 units; bias cell: cnt = len, so its term is R_d);
  W_b  += round(lr * G_b / n)          — one float op on exact
          integers, re-rounded to the integer weight grid.

Any aggregation order, any partitioning, any engine produces the same
integers, so the DuckDB oracle replays all T iterations as unrolled
CTEs and hash-matches bit-for-bit (plans/queries_r6.py).

Scale shape (per iteration, T total): the (doc, bucket, cnt) frame is
checkpointed once and scanned twice per iteration — once joined to
the B-entry weight literal for z (B+1-row model, broadcast by
construction), once joined doc-grain for the gradient; both
aggregations partial-combine map-side (score pass collapses to one
row per doc, gradient pass to <= B+1 rows per partition). The driver
holds B+1 integers. Magnitudes: cnt <= len <= ~1e6-token docs,
|R| <= 1e6, so cnt*R <= 1e12 stays exact in int64/double; gradient
sums overflow int64 only past ~9e6 equivalent full-residual docs per
bucket at that doc length — far past any real batch (and a larger
weight grid constant is the lever if ever needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # weight / residual quantization: 6 decimal places


def _round_half_away(x: float) -> int:
    """Round half away from zero — Python's round() is half-to-even,
    which would diverge from Spark's/DuckDB's round() the first time a
    weight update lands exactly on .5 (e.g. lr*g/n with g == n)."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else -int(
        math.floor(-x + 0.5))


def _bucket(col: Column, buckets: int, salt: str) -> Column:
    """60-bit md5 prefix mod buckets — the engine-portable hash every
    sampling/sketch operator here pins."""
    return (
        F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.lower(col))), 1, 15), 16, 10)
        .cast("long") % buckets
    )


def hashed_features(df: DataFrame, label: Column, text_col: str = "text",
                    id_col: str = "doc_id", buckets: int = 64,
                    salt: str = "qcls-v1") -> tuple[DataFrame, DataFrame]:
    """(counts, docs): counts = (id, bucket, cnt) hashed-bag term
    counts; docs = (id, len, y) with len = token count, y in {0,1}.
    Zero-token docs are excluded (they carry no features; score_
    assigns them the zero-logit 0.5)."""
    from hummingbird_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col), label.cast("long").alias("y"),
        F.explode(tokens(F.col(text_col))).alias("w"),
    )
    counts = (
        toks.groupBy(id_col, _bucket(F.col("w"), buckets, salt)
                     .alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    docs = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("len"), F.first("y").alias("y"))
    return counts, docs


def train_hashed_logreg(df: DataFrame, label: Column,
                        text_col: str = "text", id_col: str = "doc_id",
                        buckets: int = 64, iterations: int = 3,
                        lr: float = 0.5,
                        salt: str = "qcls-v1") -> list[int]:
    """T full-batch quantized-GD iterations from zero init; returns
    the B+1 integer weights (1e-6 space), bias last.

    The bias is folded in as a synthetic feature row per doc
    (bucket = B, cnt = len): z's dot product then includes the
    len * W_bias term with no separate expression, and the gradient
    groupBy yields all B+1 entries in ONE collect per iteration —
    round(len * R / len) == R exactly (len*R <= ~1e12 is
    double-exact), so the folded bias gradient is identical to the
    sum-of-residuals form the docstring equations (and the SQL
    oracle) state."""
    counts, docs = hashed_features(df, label, text_col, id_col,
                                   buckets, salt)
    counts = (
        counts.unionByName(
            docs.select(id_col, F.lit(buckets).alias("bucket"),
                        F.col("len").alias("cnt")))
        .localCheckpoint(eager=False)
    )
    docs = docs.localCheckpoint(eager=False)
    n: int | None = None
    w = [0] * (buckets + 1)
    for _ in range(iterations):
        resid = _residuals(counts, docs, w, id_col)
        grad = (
            counts.join(resid, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.round(F.col("cnt") * F.col("R") / F.col("len"),
                               0).cast("long")).alias("g"))
        )
        if n is None:
            # fold the doc count into the first gradient collect as a
            # synthetic bucket=-1 row — one driver round-trip instead
            # of a separate docs.count() barrier (guide §2.6)
            grad = grad.unionByName(
                docs.groupBy().agg(F.count(F.lit(1)).alias("g"))
                .select(F.lit(-1).alias("bucket"), "g"))
        grad_rows = grad.collect()
        grads = {r["bucket"]: r["g"] for r in grad_rows}
        if n is None:
            n = int(grads.pop(-1))
            if n == 0:
                return w
        for b in range(buckets + 1):
            w[b] += _round_half_away(lr * (grads.get(b) or 0) / n)
    return w


def _residuals(counts: DataFrame, docs: DataFrame, w: list[int],
               id_col: str) -> DataFrame:
    """(id, len, R): integer residuals under the current weights.
    `counts` includes the bias rows, `w` indexes all B+1 entries."""
    warr = F.array(*[F.lit(int(x)) for x in w])
    z_num = (
        counts.select(
            id_col,
            (F.col("cnt")
             * F.element_at(warr, (F.col("bucket") + 1).cast("int")))
            .alias("t"),
        )
        .groupBy(id_col).agg(F.sum("t").alias("zs"))
    )
    z = F.col("zs") / (F.col("len") * F.lit(float(SCALE)))
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return (
        docs.join(z_num, id_col)
        .select(
            id_col, "len",
            F.round((F.col("y") - p) * SCALE, 0).cast("long").alias("R"),
        )
    )


def score_hashed_logreg(df: DataFrame, weights: list[int],
                        text_col: str = "text", id_col: str = "doc_id",
                        buckets: int = 64,
                        salt: str = "qcls-v1") -> DataFrame:
    """(id, score): round(sigmoid(z), 6) under trained integer
    weights for EVERY input row; zero-token docs score exactly 0.5."""
    from hummingbird_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
    warr = F.array(*[F.lit(int(x)) for x in weights[:buckets]])
    per_doc = (
        toks.groupBy(
            F.col(id_col),
            _bucket(F.col("w"), buckets, salt).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * F.element_at(
                warr, (F.col("bucket") + 1).cast("int"))).alias("zs"),
            F.sum("cnt").alias("len"),
        )
    )
    z = (F.col("zs") + F.col("len") * F.lit(int(weights[buckets]))) \
        / (F.col("len") * F.lit(float(SCALE)))
    scored = per_doc.select(
        id_col,
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(id_col,
                F.coalesce("score", F.lit(0.5)).alias("score"))
    )


def train_and_score(df: DataFrame, label: Column,
                    text_col: str = "text", id_col: str = "doc_id",
                    buckets: int = 64, iterations: int = 3,
                    lr: float = 0.5,
                    salt: str = "qcls-v1") -> DataFrame:
    """(id, score, label) for every row — the classifier-filter query
    shape: train on the corpus's own seed labels, score everything."""
    w = train_hashed_logreg(df, label, text_col, id_col, buckets,
                            iterations, lr, salt)
    return (
        score_hashed_logreg(df, w, text_col, id_col, buckets, salt)
        .join(df.select(id_col, label.cast("long").alias("label")),
              id_col)
    )
