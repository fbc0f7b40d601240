"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, "Data Selection for Language Models via Importance
Resampling").

Selects raw-corpus documents that look like a small TARGET corpus
(the paper's motivating case: pick web pages that read like
Wikipedia/books before pretraining). Method, exactly as published:

  1. featurize every doc as a bag of HASHED n-grams (unigrams +
     bigrams hashed into B buckets — the paper's 10k-bucket variant);
  2. fit two bag-of-ngrams multinomials, p over the target docs and
     q over the full raw corpus (add-alpha smoothed here so empty
     buckets stay finite);
  3. per-doc importance weight  log w_d = sum_b c_d[b]*(ln p_b - ln q_b);
  4. sample k docs WITHOUT replacement ~ w via Gumbel top-k:
     argtop-k( log w_d + g_d ), g_d standard Gumbel noise.

Spark shape, sized for a 100 TB raw corpus:

  - featurize rides the scan: tokens -> lowered unigram+bigram arrays
    -> explode -> md5-bucket, then ONE groupBy (doc, bucket) whose
    partial agg absorbs stopword buckets map-side. The (doc, bucket)
    COUNT grain is the counts-grain lesson from bigram_perplexity: a
    hot bucket ("of the" & friends) hits downstream joins once per
    doc, not once per occurrence.
  - both models come out of ONE groupBy(bucket) over that frame
    (raw = sum, target = conditional sum) — B rows total, so the
    model and its 1-row totals BROADCAST; scoring is a broadcast
    equi-join + one groupBy(doc). Two shuffles end to end, both on
    pre-aggregated count frames; nothing driver-side.
  - Gumbel noise is derived, not drawn: u_d = (md5_60(seed:doc_id)+1)
    / (2^60+2), g_d = -ln(-ln u_d). Deterministic given (seed, id) —
    reproducible under retries/speculative execution (a real rand()
    would make task retries non-idempotent) and SQL-replicable, so
    the whole selection carries a full DuckDB oracle.

Hashing: bucket = 60-bit md5 prefix mod B — the same
conv(substring(md5,1,15)) idiom MinHash pins, chosen for exact
DuckDB parity (('0x'||substr(md5(g),1,15))::BIGINT). Scores round
to 6 dp before any ordering with a doc_id tie-break, the
engine-stability discipline every float-bearing operator here uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hummingbird_spark.functions.text import doc_bigrams, tokens

#: 2^60 — the md5-prefix hash domain shared with MinHash/winnowing.
DSIR_MOD = 1 << 60


def _bucket(col: Column, buckets: int) -> Column:
    """60-bit md5 prefix mod `buckets` (DuckDB-replicable)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        % F.lit(buckets)
    )


def hashed_ngram_counts(df: DataFrame, is_target: Column,
                        text_col: str = "text", id_col: str = "doc_id",
                        buckets: int = 4096) -> DataFrame:
    """(doc_id, __tgt, bkt, cnt) — per-doc hashed-ngram bucket counts
    (unigrams + bigrams, lowercased whitespace tokens). Docs with no
    tokens contribute no rows; callers left-join them back."""
    from hummingbird_spark.operators.dedup import ensure_kernel_parallelism

    # tokenize+explode+hash rides the scan stage: spread a small
    # single-file corpus across the session's cores first (no-op at
    # scale — see ensure_kernel_parallelism)
    toks = ensure_kernel_parallelism(df).select(
        F.col(id_col), is_target.alias("__tgt"),
        F.transform(tokens(F.col(text_col)),
                    lambda w: F.lower(w)).alias("__ws"),
        doc_bigrams(F.col(text_col)).alias("__bg"),
    )
    grams = toks.select(
        id_col, "__tgt",
        F.explode(F.concat("__ws", "__bg")).alias("__g"),
    )
    return (
        grams
        .select(id_col, "__tgt", _bucket(F.col("__g"), buckets).alias("bkt"))
        .groupBy(id_col, "__tgt", "bkt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(df: DataFrame, is_target: Column,
                     text_col: str = "text", id_col: str = "doc_id",
                     buckets: int = 4096,
                     alpha: float = 0.5) -> DataFrame:
    """One row per input doc: (doc_id, log_w) — the DSIR importance
    log-weight of every raw doc toward the `is_target` slice, rounded
    to 6 dp. Docs with no n-grams (only empty text — a 1-token doc
    still yields its unigram) score 0.0.

    `is_target` is any boolean Column over df's columns (e.g.
    F.col("lang") == "en"); the target model is fit on that slice of
    the same frame, so one scan feeds both multinomials.
    """
    db = hashed_ngram_counts(df, is_target, text_col, id_col, buckets)
    # three consumers (model, model totals, scoring probe) — stage the
    # tokenize+explode+count once instead of re-scanning the corpus
    # per consumer (same staging discipline as the LSH banded frame)
    db = db.localCheckpoint(eager=False)

    # model is B rows, but it has TWO consumers (totals and lr) —
    # without the checkpoint each re-runs the groupBy(bkt) over the
    # full (doc, bucket) frame
    model = db.groupBy("bkt").agg(
        F.sum("cnt").alias("raw_cnt"),
        F.sum(F.when(F.col("__tgt"), F.col("cnt")).otherwise(F.lit(0)))
        .alias("tgt_cnt"),
    ).localCheckpoint(eager=False)
    totals = model.agg(
        F.sum("raw_cnt").alias("raw_tot"),
        F.sum("tgt_cnt").alias("tgt_tot"),
    )
    a, ab = float(alpha), float(alpha) * buckets
    lr = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "bkt",
            (F.log((F.col("tgt_cnt") + a) / (F.col("tgt_tot") + ab))
             - F.log((F.col("raw_cnt") + a) / (F.col("raw_tot") + ab))
             ).alias("__lw"),
        )
    )
    scores = (
        db.join(F.broadcast(lr), "bkt")
        .groupBy(id_col)
        .agg(F.round(F.sum(F.col("cnt") * F.col("__lw")), 6)
             .alias("log_w"))
    )
    return (
        df.select(id_col)
        .join(scores, id_col, "left")
        .select(id_col, F.coalesce("log_w", F.lit(0.0)).alias("log_w"))
    )


def gumbel_key(id_col: Column, seed: str) -> Column:
    """Deterministic standard-Gumbel noise from (seed, id):
    g = -ln(-ln u), u = (md5_60(seed || ':' || id) + 1) / (2^60 + 2).
    u is strictly inside (0,1), so g is always finite."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string"))),
            1, 15),
        16, 10).cast("long")
    u = (h + F.lit(1).cast("double")) / F.lit(float(DSIR_MOD) + 2.0)
    return -F.log(-F.log(u))


def dsir_select(df: DataFrame, is_target: Column, k: int,
                text_col: str = "text", id_col: str = "doc_id",
                buckets: int = 4096, alpha: float = 0.5,
                seed: str = "dsir") -> DataFrame:
    """Gumbel top-k importance resampling: k docs sampled without
    replacement with probability proportional to their importance
    weight (the Gumbel-max trick makes top-k(log w + Gumbel) exactly
    that sample). Deterministic given `seed`. Returns
    (doc_id, log_w, gumbel_score) sorted by score desc.

    Scale: log-weights is the two-shuffle pipeline above; the
    selection itself is one TakeOrdered over doc-grain rows — no
    extra shuffle, any k that fits the driver (training-data curation
    uses k ~ corpus fraction; for huge k switch the limit to a
    per-partition threshold filter on the same score column).
    """
    w = dsir_log_weights(df, is_target, text_col, id_col, buckets, alpha)
    return (
        _gumbel_scored(w, id_col, seed)
        .orderBy(F.desc("gumbel_score"), id_col)
        .limit(k)
    )


def _gumbel_scored(w: DataFrame, id_col: str, seed: str) -> DataFrame:
    return w.select(
        id_col, "log_w",
        F.round(F.col("log_w") + gumbel_key(F.col(id_col), seed), 6)
        .alias("gumbel_score"),
    )


def dsir_select_distributed(df: DataFrame, is_target: Column, k: int,
                            text_col: str = "text", id_col: str = "doc_id",
                            buckets: int = 4096, alpha: float = 0.5,
                            seed: str = "dsir",
                            relative_error: float = 1e-4,
                            trim_cap: int = 100_000) -> DataFrame:
    """`dsir_select` for huge k — EXACTLY the same k rows (same
    tie-break: score desc, id asc), but the result never funnels
    through a driver-side top-k merge, so k can be a corpus fraction
    (10^9 docs of a 100 TB corpus) instead of "fits the driver".

    How: quantile-cutoff refinement. approxQuantile (Greenwald-Khanna,
    one pass, distributed) finds a score cutoff whose rank-from-top is
    deliberately OVERSHOT by ~2*eps*n, so after the error bound
    (+-eps*n) the cutoff is still at-or-below the k-th score and
    `score >= cutoff` provably keeps every top-k row. The excess above
    k (~3*eps*n rows) is re-trimmed by the same cutoff trick until it
    is under `trim_cap`, and the final sliver is removed with a
    TakeOrdered-bottom anti-join (ascending score, descending id: the
    exact mirror of the keep order). Each pass's eps is the COARSER of
    `relative_error` and trim_cap/(6*m): a fixed eps would floor the
    excess at ~3*eps*k (over the cap once k > cap/(3*eps)), while the
    adaptive pass aims the expected excess at ~cap/2 directly — the
    first pass runs coarse and cheap over all n, later passes sharpen
    only as the frame shrinks (GK sketch cost ~1/eps, floored at 1e-7),
    so 2-3 passes cover any (n, k) up to 10^12. Driver traffic is
    bounded by trim_cap + the quantile sketch regardless of k and n;
    the returned frame stays distributed and is NOT globally sorted
    (ordering a billion-row selection is the caller's presentation
    choice, not the sampler's job).

    Equality with the `orderBy().limit(k)` path is pinned by test and
    by the registry oracle (`dsir_selection_distributed` hash-matches
    the same LIMIT-k SQL as `dsir_selection`).
    """
    w = dsir_log_weights(df, is_target, text_col, id_col, buckets, alpha)
    scored = _gumbel_scored(w, id_col, seed).localCheckpoint(eager=False)

    surv, m = scored, scored.count()
    if k >= m:
        return surv
    # Refine: overshoot the cutoff rank by 2*eps*n so the sketch's
    # +-eps*n rank error can never push it above the k-th score.
    sketch_violated = False
    for _ in range(8):
        if m - k <= trim_cap:
            break
        eps = min(relative_error, max(trim_cap / (6.0 * m), 1e-7))
        margin = int(2 * eps * m) + 1
        q = 1.0 - min(1.0, (k + margin) / m)
        cutoff = surv.approxQuantile("gumbel_score", [q], eps)[0]
        cand = surv.filter(F.col("gumbel_score") >= cutoff)
        cand = cand.localCheckpoint(eager=False)
        c = cand.count()
        if c < k:  # sketch guarantee violated — keep the wider frame
            sketch_violated = True
            break
        surv, m = cand, c
    excess = m - k
    # Driver-bounded contract: the final trim funnels `excess` rows
    # through a TakeOrdered + broadcast. The loop aims for
    # excess <= trim_cap; a small overshoot (the last pass's sliver)
    # is fine, but if refinement exited early (sketch violation or
    # non-converging cutoffs) excess can be arbitrarily large —
    # refusing loudly beats silently collecting an unbounded bottom
    # set on the driver.
    if excess > max(10 * trim_cap, 1000):
        raise RuntimeError(
            f"dsir_select_distributed: refinement left excess={excess:,} "
            f"rows to trim (trim_cap={trim_cap:,}) after "
            f"{'a sketch-guarantee violation' if sketch_violated else '8 passes'}"
            " — raise trim_cap, loosen relative_error, or use dsir_select"
        )
    if excess > trim_cap:
        import warnings

        warnings.warn(
            f"dsir_select_distributed: final trim of {excess:,} rows "
            f"exceeds trim_cap={trim_cap:,}; driver traffic is bounded "
            "but above target", RuntimeWarning, stacklevel=2)
    if excess > 0:
        bottom = (
            surv.orderBy(F.asc("gumbel_score"), F.desc(id_col))
            .limit(excess)
            .select(id_col)
        )
        surv = surv.join(F.broadcast(bottom), id_col, "left_anti")
    return surv


def aes_key(id_col: Column, weight: Column, seed: str) -> Column:
    """Efraimidis-Spirakis weighted-reservoir priority (Inf. Process.
    Lett. 2006): rank by u^(1/w), realized as the monotone-equivalent
    ln(u)/w with the SAME derived uniform the Gumbel draw uses
    (u = (md5_60(seed:id)+1)/(2^60+2) — retry-idempotent, no rand(),
    SQL-replicable). Rounded to 6 dp per the engine-stability
    discipline; callers tie-break on id.

    Precision contract (documented, not hidden): the 6-dp rounding is
    ABSOLUTE, so keys live on a 1e-6 grid. ln(u) spans roughly
    [-41.6, 0); for weights up to ~1e3 that leaves thousands of
    distinct grid levels per stratum and ties are rare. For w >> 1e3
    the keys collapse toward 0 on the coarse grid, ties dominate, and
    the ascending-id tie-break makes the 'weighted random' order
    substantially id-ordered — rescale such weights (e.g. divide by
    sum(w)/n) before calling; the E-S order is invariant to a global
    weight scale. Weights are also clamped to >= 1.0 (F.greatest
    below): fractional weights are deliberately treated as 1 so
    ln(u)/w never amplifies past the rounding grid's resolution —
    callers with sub-unit weights must rescale up, not rely on E-S
    semantics below 1.0. Both bounds hold identically in every SQL
    oracle that replays this formula."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string"))),
            1, 15),
        16, 10).cast("long")
    u = (h + F.lit(1).cast("double")) / F.lit(float(DSIR_MOD) + 2.0)
    return F.round(F.log(u) / F.greatest(weight.cast("double"),
                                         F.lit(1.0)), 6)


def stratified_reservoir(df: DataFrame, strata_col: str, k: int,
                         weight_col: str | None = None,
                         id_col: str = "doc_id",
                         seed: str = "rsv",
                         method: str = "window") -> DataFrame:
    """k-per-stratum weighted sampling WITHOUT replacement: the
    Efraimidis-Spirakis reservoir with derived priorities. Because the
    priority is a pure function of (seed, id, weight) — not of arrival
    order — the top-k is the same under ANY partitioning, any merge
    order, and any stream/batch split: the streaming twin
    (streaming/reservoir.py) maintains the identical sample by
    construction, and the whole operator carries a full SQL oracle
    (classic reservoir sampling has neither property).

    Returns (strata, id, weight?, rk), rk = 1..k by priority desc.

    Scale: method='window' is one scan + one per-stratum window sort;
    a dominant stratum makes that window one hot task. method='cutoff'
    is the two-phase guard (the cluster_balanced_sample discipline,
    adapted to E-S keys): since P(key >= c) = 1 - exp(c*w) for the
    derived uniform, the per-stratum cutoff c_s = -4k / sum(w) —
    computed from an EXACT aggregate, so it is itself deterministic
    and partition-invariant — keeps ~4k expected survivors, and only
    those enter the window sort. The 4x margin makes undershoot
    astronomically unlikely (Chernoff on a mean-4k sum of independent
    indicators); if a cutoff does undershoot, the (smaller) sample is
    still the deterministic top of the survivors — same contract as
    the cluster sampler, measured in scripts/skew_probe_reservoir.py."""
    from pyspark.sql import Window

    w = (F.col(weight_col) if weight_col is not None
         else F.lit(1.0))
    keyed = df.select(
        strata_col, id_col,
        *([weight_col] if weight_col is not None else []),
        aes_key(F.col(id_col), w, seed).alias("__key"),
    )
    if method == "cutoff":
        w_eff = (F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
                 if weight_col is not None else F.lit(1.0))
        agg = (
            df.select(strata_col, w_eff.alias("__w"))
            .groupBy(strata_col)
            .agg(F.sum("__w").alias("__sw"),
                 F.count(F.lit(1)).alias("__n"))
        )
        # per-stratum cutoff rows: small by construction (one per
        # stratum), broadcast into the keyed scan
        cuts = agg.select(
            strata_col,
            F.when(F.col("__n") <= 4 * k, F.lit(float("-inf")))
            .otherwise(F.lit(-4.0 * k) / F.col("__sw"))
            .alias("__cut"),
        )
        keyed = (
            keyed.join(F.broadcast(cuts), strata_col)
            .filter(F.col("__key") >= F.col("__cut"))
            .drop("__cut")
        )
    win = Window.partitionBy(strata_col) \
        .orderBy(F.desc("__key"), id_col)
    return (
        keyed.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= k)
        .drop("__key")
    )
