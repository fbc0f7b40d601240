"""Corpus retrieval: BM25 ranking and hybrid (lexical + vector) fusion.

The retrieval side of a training-data/RAG pipeline: BM25 is the
standard lexical ranker (Robertson/Sparck Jones probabilistic
weighting), and reciprocal-rank fusion (RRF, Cormack et al. 2009 —
also Mongo 8's $rankFusion / Atlas hybrid search) combines it with
embedding similarity without score calibration.

Scale shape:
  - BM25 is fully relational: tokenize -> explode -> filter to query
    terms (the filter rides the explode, so only query-term postings
    shuffle — a handful of terms, not the corpus vocabulary),
    per-(doc, term) TF, per-term DF as a broadcast (|query| rows),
    one score aggregation, TakeOrdered top-k. No UDFs.
  - RRF consumes two ranked lists (top-k each) — post-aggregate
    frames of k rows; every join in the fusion is broadcast-size.

Determinism: ln() on both engines is the same IEEE double; scores
round to 6 dp before ordering with an id tie-break, so ranks are
engine-stable (same discipline as the cosine operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hummingbird_spark.functions.text import tokens


def bm25_scores(df: DataFrame, query_terms: list[str],
                text_col: str = "text", id_col: str = "doc_id",
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(id, score) for every document matching >=1 query term, BM25:

        idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        s(d)    = sum_t idf(t) * tf * (k1+1)
                  / (tf + k1 * (1 - b + b * dl/avgdl))

    Matching is lowercase whole-token. The per-term DF table and the
    (N, avgdl) scalars are broadcast; only query-term postings move.
    """
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col),
        F.transform(tokens(F.col(text_col)),
                    lambda w: F.lower(w)).alias("__ws"),
    )
    lengths = toks.select(id_col, F.size("__ws").alias("__dl"))
    corpus = lengths.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    postings = (
        toks.select(F.col(id_col), F.explode("__ws").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("term").agg(
        F.count_distinct(F.col(id_col)).alias("df_t"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    tf_term = (
        F.col("tf") * (k1 + 1)
        / (F.col("tf")
           + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl")))
    )
    return (
        postings
        .join(F.broadcast(dfreq), "term")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(corpus))
        .groupBy(id_col)
        .agg(F.round(F.sum(idf * tf_term), 6).alias("score"))
    )


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              **kw) -> DataFrame:
    scores = bm25_scores(df, query_terms, **kw)
    id_col = scores.columns[0]
    return scores.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def rrf_fuse(ranked: list[DataFrame], id_col: str = "doc_id",
             rrf_k: int = 60, k: int = 10,
             weights: list[float] | None = None) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists (each: (id, score) in
    rank order already materializable by (score desc, id)):
    rrf(d) = sum_lists w_i / (rrf_k + rank_d); docs missing from a
    list contribute nothing for it. The standard calibration-free
    hybrid combiner ($rankFusion / Cormack et al.); `weights` is the
    stage's combination.weights (default 1.0 each)."""
    from pyspark.sql.window import Window

    if weights is not None and len(weights) != len(ranked):
        raise ValueError("weights must match the number of lists")
    contribs = []
    for i, r in enumerate(ranked):
        wt = float(weights[i]) if weights is not None else 1.0
        w = Window.orderBy(F.desc("score"), F.asc(id_col))
        contribs.append(
            r.select(
                F.col(id_col),
                (F.lit(wt) / (F.lit(float(rrf_k))
                              + F.row_number().over(w)))
                .alias("__c"),
            )
        )
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    return (
        allc.groupBy(id_col)
        .agg(F.round(F.sum("__c"), 6).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(k)
    )


def bigram_perplexity(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      alpha: float = 0.1,
                      vocab_top_k: int | None = None) -> DataFrame:
    """Per-doc bigram language-model perplexity, trained on the corpus
    itself — the CCNet-style quality filter (low perplexity under an
    in-domain LM = fluent text; gibberish scores high):

        P(w2 | w1) = (B(w1,w2) + alpha) / (U(w1) + alpha * V)
        ppl(d)     = exp( mean over d's bigrams of -ln P )

    Add-alpha smoothing keeps unseen bigrams finite. Docs with <2
    tokens emit no row. Rounded to 4 dp: the per-doc mean is a float
    sum whose order differs across engines; 4 dp absorbs the drift at
    any doc length.

    Scale shape (r3-verdict skew item): everything downstream of the
    explode runs over per-doc bigram COUNTS — one row per (doc,
    bigram) — so the model equi-join's probe side carries a hot bigram
    ("of the") at most once per document, not once per occurrence;
    the per-doc mean is the d_cnt-weighted mean, which is identical.
    The model tables derive from those counts without re-reading the
    corpus: B(w1,w2) = sum of d_cnt per bigram, U(w1) = sum of B over
    bigrams with context w1 (exact: every occurrence of w1 as a
    context IS a bigram occurrence), V = count of distinct contexts.

    vocab_top_k=K caps the BIGRAM table (the Heaps-law growth term at
    100 TB) to the K globally most frequent bigrams, ties broken by
    bigram text; pruned bigrams score as unseen (B=0 under the same
    smoothing). U and V stay exact — the unigram/context table is
    vocabulary-sized, not the memory driver. Documented accuracy
    trade: capped perplexity >= exact perplexity (probabilities only
    lose mass), approaching equality as K covers the corpus; with K
    >= the distinct-bigram count the result is bit-identical to the
    exact path.

    Join shape (r4-verdict scale item): the per-bigram NLL is
    precomputed at MODEL grain (the <=K-row bi table joined to uni —
    a tiny-by-tiny join), so the big frame joins ONE model table.

    CAPPED path: the model is bounded and BROADCAST, which removes
    every skew concern from the probe side (a map-side hash lookup has
    no hot keys) — so scoring runs at raw OCCURRENCE grain: the
    staged explode feeds (a) the model counts (map-side partial agg
    collapses each partition to <= |vocab| rows, a nearly-free
    shuffle) and (b) the scoring pass, which is lookup -> one
    groupBy(id). One wide shuffle total. Pruned bigrams take their
    unseen NLL from a second broadcast table keyed by context word
    (vocabulary-sized; at an extreme unigram vocabulary swap that
    broadcast for a shuffle join of only the pruned rows).

    UNCAPPED path: the model is the unbounded Heaps term and must not
    be broadcast, so the equi-join shuffles — and the probe side
    pre-aggregates to (doc, bigram) counts grain first, the r3 skew
    cap: a hot bigram ("of the") hits the join once per doc, not once
    per occurrence. The per-doc d_cnt-weighted mean equals the
    occurrence-grain mean.
    """
    from hummingbird_spark.functions.text import doc_bigrams
    from hummingbird_spark.operators.dedup import ensure_kernel_parallelism

    grams = ensure_kernel_parallelism(df).select(
        F.col(id_col), F.explode(doc_bigrams(F.col(text_col))).alias("bg")
    )
    w1 = F.split(F.col("bg"), " ")[0]
    nll = -F.log(
        (F.col("b_cnt") + alpha)
        / (F.col("u_cnt") + alpha * F.col("v")))

    if vocab_top_k is not None:
        # stage the explode once for its two consumers (model counts,
        # scoring); re-running tokenize+explode instead measured 1.6x
        # slower at the 10x replica
        grams = grams.localCheckpoint(eager=False)
        # stage the MODEL-grain frames too: bi_full (one wide
        # groupBy(bg) over every gram occurrence) feeds uni and the
        # top-K cut, and uni feeds the model join, vocab and the
        # unseen table — without the checkpoints each consumer
        # re-runs the wide groupBy from the grams RDD (the plan
        # carried FOUR copies of it). Both frames are model-sized
        # (Heaps term / vocabulary), never corpus-sized.
        bi_full = grams.groupBy("bg").agg(
            F.count(F.lit(1)).alias("b_cnt")).localCheckpoint(eager=False)
        uni = (
            bi_full.select(w1.alias("w1"), "b_cnt")
            .groupBy("w1").agg(F.sum("b_cnt").alias("u_cnt"))
        )
        vocab = uni.agg(F.count(F.lit(1)).alias("v"))
        # TakeOrdered, not a global sort; deterministic tie-break
        bi = bi_full.orderBy(F.desc("b_cnt"), "bg").limit(vocab_top_k)
        # bi is <= K rows BY CONSTRUCTION (the literal cap), so it is
        # broadcast-safe at any corpus scale; uni then never shuffles
        # for this join
        model = (
            uni.join(F.broadcast(bi.withColumn("w1", w1)), "w1")
            .crossJoin(F.broadcast(vocab))
            .select("bg", nll.alias("__nll"))
        )
        # pruned bigrams (left-join miss) score as unseen via the
        # per-context table
        unseen_nll = -F.log(
            F.lit(alpha) / (F.col("u_cnt") + alpha * F.col("v")))
        unseen = (
            uni.crossJoin(F.broadcast(vocab))
            .select("w1", unseen_nll.alias("__unll"))
        )
        return (
            grams.join(F.broadcast(model), "bg", "left")
            .withColumn("w1", w1)
            .join(F.broadcast(unseen), "w1")
            .groupBy(id_col)
            .agg(
                F.round(F.exp(F.avg(
                    F.coalesce("__nll", "__unll"))), 4)
                .alias("perplexity"),
                F.count(F.lit(1)).alias("n_bigrams"),
            )
        )

    # uncapped: counts-grain probe side, shuffle equi-join (see
    # docstring); the (doc, bigram) frame is staged for its two
    # consumers
    doc_bi = grams.groupBy(id_col, "bg").agg(
        F.count(F.lit(1)).alias("d_cnt")
    ).localCheckpoint(eager=False)
    # same model-grain staging as the capped path: bi_full feeds uni
    # and the model join, uni feeds vocab and the model join — each
    # would otherwise re-run its groupBy from doc_bi
    bi_full = doc_bi.groupBy("bg").agg(
        F.sum("d_cnt").alias("b_cnt")).localCheckpoint(eager=False)
    uni = (
        bi_full.select(w1.alias("w1"), "b_cnt")
        .groupBy("w1").agg(F.sum("b_cnt").alias("u_cnt"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    model = (
        bi_full.withColumn("w1", w1)
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("bg", nll.alias("__nll"))
    )
    return (
        # shuffle_hash, pinned: the uncapped model is the Heaps term —
        # Catalyst would broadcast it at mid scale (estimate under the
        # 64 MB threshold) and that build grows without bound with the
        # corpus; the shuffle join is the only plan that survives
        # every scale (same rationale as kn_trigram_perplexity's
        # type-grain pins)
        doc_bi.join(model.hint("shuffle_hash"), "bg")
        .groupBy(id_col)
        .agg(
            F.round(
                F.exp(F.sum(F.col("d_cnt") * F.col("__nll"))
                      / F.sum("d_cnt")), 4
            ).alias("perplexity"),
            F.sum("d_cnt").alias("n_bigrams"),
        )
    )


def kn_trigram_perplexity(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          discount: float = 0.75,
                          model_top_k: int | None = None) -> DataFrame:
    """Per-doc perplexity under an interpolated Kneser-Ney trigram LM
    trained on the corpus itself (Chen & Goodman 1998 — the smoothing
    KenLM implements and CCNet's quality filter relies on; the add-
    alpha `bigram_perplexity` is the cheap sibling, this is the
    published-standard one):

        P(w|u,v) = max(c3(uvw)-D, 0)/c2(uv)
                   + D*N1+(uv.)/c2(uv) * P(w|v)
        P(w|v)   = max(N1+(.vw)-D, 0)/N1+(.v.)
                   + D*N1+(v.)/N1+(.v.) * Pcont(w)
        Pcont(w) = N1+(.w) / |distinct (v,w) types|

    with a single fixed discount D at both levels and KN continuation
    counts (distinct-context types, not raw counts) below the top
    order. The whole count hierarchy derives from the trigram-type
    table (bigram types = trigram-interior (v,w) types), so the model
    build reads the corpus exactly once; boundary pairs outside any
    trigram are excluded by construction — documented, deterministic.
    Every scored trigram is in-model (same corpus), so no zero
    denominators and no out-of-vocabulary branch.

    Scale shape: scoring joins at (doc, trigram) COUNTS grain (the r3
    skew cap: "of the people" hits the model join once per doc, not
    once per occurrence; the per-doc d_cnt-weighted mean equals the
    occurrence-grain mean). The model build is joins among TYPE-grain
    tables (the Heaps term) keyed on progressively shorter contexts;
    each probe row matches exactly one build row, so hot words fan
    out only on the probe side, which AQE skew-splits. The NLL is
    precomputed at model grain — the big frame joins ONE table.
    `bigram_perplexity(vocab_top_k=...)`'s broadcast-cap lever applies
    the same way here if the trigram-type table ever needs bounding.

    Docs with <3 tokens emit no row. Perplexity rounds to 4 dp (the
    per-doc weighted mean is the only order-dependent float sum; every
    model probability is a fixed expression tree over exact integer
    counts, mirrored verbatim in the DuckDB oracle).

    model_top_k=K caps the TRIGRAM table (the top Heaps-law term) to
    the K most frequent trigram types (ties by trigram text); capped
    trigrams' NLLs BROADCAST. Pruned trigrams score through the SAME
    published formula with c3=0 — max(c3-D,0) vanishes and what
    remains is the interpolation weight times the bigram-level KN
    term, i.e. the natural backoff — via shuffle joins to the exact
    lower-order tables at (u,v) and (v,w) grain. The cap removes
    precisely the HOT keys from those joins (a frequent trigram is in
    the kept set by definition), so the pruned-tail joins have no
    skewable key; lower-order tables stay exact, as in
    bigram_perplexity's cap. Capped perplexity >= exact (mass only
    moves to the backoff term); K >= the trigram-type count is
    bit-identical to the exact path.
    """
    from hummingbird_spark.functions.text import doc_trigrams
    from hummingbird_spark.operators.dedup import ensure_kernel_parallelism

    D = float(discount)
    grams = ensure_kernel_parallelism(df).select(
        F.col(id_col),
        F.explode(doc_trigrams(F.col(text_col))).alias("tg"),
    )
    doc_tg = grams.groupBy(id_col, "tg").agg(
        F.count(F.lit(1)).alias("d_cnt")
    ).localCheckpoint(eager=False)

    parts = F.split(F.col("tg"), " ")
    c3 = (
        doc_tg.groupBy("tg").agg(F.sum("d_cnt").alias("c3"))
        .select(
            "tg", "c3",
            parts[0].alias("u"), parts[1].alias("v"), parts[2].alias("w"),
        )
        .localCheckpoint(eager=False)  # four consumers below
    )
    # context totals + N1+(uv.) at (u,v) grain — c3 rows ARE distinct
    # trigram types, so count(*) is the continuation-type count
    ctx2 = c3.groupBy("u", "v").agg(
        F.sum("c3").alias("c2uv"), F.count(F.lit(1)).alias("n1p_uv"))
    # bigram-level KN continuation table: N1+(.vw) = distinct u per (v,w)
    cont = c3.groupBy("v", "w").agg(F.count(F.lit(1)).alias("ncont")) \
        .localCheckpoint(eager=False)  # three consumers below
    midv = cont.groupBy("v").agg(
        F.sum("ncont").alias("n1p_v_mid"),    # N1+(.v.)
        F.count(F.lit(1)).alias("n1p_v"))     # N1+(v.)
    unic = cont.groupBy("w").agg(F.count(F.lit(1)).alias("n1p_w"))
    ntypes = cont.agg(F.count(F.lit(1)).alias("nt2"))

    p_cont = F.col("n1p_w") / F.col("nt2")
    p2 = (
        F.greatest(F.col("ncont") - D, F.lit(0.0)) / F.col("n1p_v_mid")
        + F.lit(D) * F.col("n1p_v") / F.col("n1p_v_mid") * p_cont
    )
    p3 = (
        F.greatest(F.col("c3") - D, F.lit(0.0)) / F.col("c2uv")
        + F.lit(D) * F.col("n1p_uv") / F.col("c2uv") * p2
    )
    def _finish(per_occurrence: DataFrame) -> DataFrame:
        return (
            per_occurrence.groupBy(id_col)
            .agg(
                F.round(
                    F.exp(F.sum(F.col("d_cnt") * F.col("__nll"))
                          / F.sum("d_cnt")), 4
                ).alias("kn_perplexity"),
                F.sum("d_cnt").alias("n_trigrams"),
            )
        )

    if model_top_k is not None:
        # TakeOrdered, not a global sort; deterministic tie-break
        kept = c3.orderBy(F.desc("c3"), "tg").limit(model_top_k)
        # the accumulating left side is <= K rows at every step —
        # broadcast IT explicitly; without the hints Catalyst would
        # pick the type-grain tables as build sides whenever their
        # estimate clears the 64 MB threshold (see shuffle_hash note
        # below — four near-threshold HashedRelations OOMed the driver
        # at 200k adversarial docs)
        model_kept = (
            F.broadcast(kept).join(ctx2, ["u", "v"])
        )
        model_kept = F.broadcast(model_kept).join(cont, ["v", "w"])
        model_kept = F.broadcast(model_kept).join(midv, "v")
        model_kept = (
            F.broadcast(model_kept).join(unic, "w")
            .crossJoin(F.broadcast(ntypes))
            .select("tg", (-F.log(p3)).alias("__nll"))
        )
        scored = doc_tg.join(F.broadcast(model_kept), "tg", "left") \
            .localCheckpoint(eager=False)  # kept + pruned consumers
        # pruned: the published formula with c3=0 — max(c3-D,0)
        # vanishes, leaving lambda(uv) * P_KN(w|v); joins to the exact
        # lower-order tables carry no hot keys (those are all kept)
        pruned_nll = -F.log(
            F.lit(D) * F.col("n1p_uv") / F.col("c2uv")
            * (F.greatest(F.col("ncont") - D, F.lit(0.0))
               / F.col("n1p_v_mid")
               + F.lit(D) * F.col("n1p_v") / F.col("n1p_v_mid")
               * p_cont)
        )
        dparts = F.split(F.col("tg"), " ")
        # shuffle_hash, pinned: ctx2/cont/midv/unic are TYPE-grain
        # tables — they grow with the corpus (the Heaps term) and must
        # never be broadcast at scale. Left to Catalyst, each one gets
        # broadcast whenever its estimate clears the 64 MB session
        # threshold; at mid scale (200k adversarial docs,
        # scripts/skew_probe_kn.py) building four near-threshold
        # HashedRelations concurrently OOMed the 8 GB driver. The
        # shuffle join is the right plan at every scale: keys
        # co-partition, the build side is one row per key, and a hot
        # probe-side context fans out into AQE's skew split.
        pruned = (
            scored.filter(F.col("__nll").isNull())
            .select(
                id_col, "d_cnt",
                dparts[0].alias("u"), dparts[1].alias("v"),
                dparts[2].alias("w"),
            )
            .join(ctx2.hint("shuffle_hash"), ["u", "v"])
            .join(cont.hint("shuffle_hash"), ["v", "w"])
            .join(midv.hint("shuffle_hash"), "v")
            .join(unic.hint("shuffle_hash"), "w")
            .crossJoin(F.broadcast(ntypes))
            .select(id_col, "d_cnt", pruned_nll.alias("__nll"))
        )
        kept_rows = scored.filter(F.col("__nll").isNotNull()) \
            .select(id_col, "d_cnt", "__nll")
        return _finish(kept_rows.unionByName(pruned))

    # same shuffle_hash pins as the pruned path above: every build
    # side here is a corpus-growing type-grain table
    model = (
        c3.join(ctx2.hint("shuffle_hash"), ["u", "v"])
        .join(cont.hint("shuffle_hash"), ["v", "w"])
        .join(midv.hint("shuffle_hash"), "v")
        .join(unic.hint("shuffle_hash"), "w")
        .crossJoin(F.broadcast(ntypes))
        .select("tg", (-F.log(p3)).alias("__nll"))
    )
    return _finish(doc_tg.join(model.hint("shuffle_hash"), "tg"))
