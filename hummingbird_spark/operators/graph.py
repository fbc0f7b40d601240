"""Graph operators over the near-dup/link graph: the domain-quality
weighting steps a large curation pipeline runs after dedup (PageRank
for quality mass, label propagation for community grouping).

Graph construction is the rare-shingle link graph: two documents are
linked when they share a word trigram whose corpus document-frequency
is small (df in [min_df, max_df]) — the shared-rare-content signal
near-dup candidate generation uses. The df cap is ALSO the scale
guard: one shingle contributes at most C(max_df, 2) pairs, so the
self-join fan-out is bounded per key by construction (no hot-shingle
skew is possible), and everything is equi-keyed shuffles.

Both iterative operators follow the repo's integer-trajectory
discipline (operators/classifier.py, cluster.py): every per-round
quantity is an exact int64 (floor-divided PageRank mass; vote counts
with a total-order tie-break), so T rounds replay as unrolled SQL CTEs
bit-for-bit, the trajectory is partition-invariant (integer sums
commute), and the registry queries carry full DuckDB oracles. Classic
float PageRank has none of these properties.

Scale: each round is a bounded set of equi-joins/aggregations on the
(node|edge)-grain frames; per-round lineage is cut with a LAZY
localCheckpoint (the r6 connected-components fix established the cut;
r11 made it lazy) so round t+1 plans scan a checkpointed frame
instead of re-deriving rounds 1..t. Lazy (eager=False) keeps the cut
— Dataset.localCheckpoint builds the checkpointed RDD at call time
and returns a LogicalRDD plan either way — but drops the per-round
driver barrier: all T rounds execute inside the ONE action that
consumes the result instead of T+2 sequential jobs, removing T
scheduler/py4j round trips per query here and T cluster-idle
barriers at scale (guide §2.6: actions are only sequential because
driver code calls them sequentially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hummingbird_spark.functions.text import doc_trigrams

# Iterative operators keep all rounds in ONE plan for ReusedExchange,
# but `rounds` is caller-supplied: cut the per-round frame's lineage
# every _CUT_EVERY rounds so analyzer/optimizer depth stays bounded
# for large round counts (no-op at the default 4; the window keeps
# the intra-window exchange-reuse win).
_CUT_EVERY = 8


def rare_trigram_edges(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", min_df: int = 2,
                       max_df: int = 5,
                       weighted: bool = False) -> DataFrame:
    """Undirected edge list (a < b): docs sharing >= 1 word trigram
    with corpus df in [min_df, max_df]. One explode at distinct-
    per-doc grain, one shuffle total: a spill-safe window df count,
    then a<b pairs from the df-capped per-trigram buckets; per-
    trigram pair fan-out <= C(max_df, 2).

    weighted: also return w = the NUMBER of shared rare trigrams per
    pair (the edge-strength signal weighted PageRank propagates)."""
    from hummingbird_spark.operators.dedup import ensure_kernel_parallelism

    # a small corpus arrives as 1-2 scan partitions, which would run
    # the tokenize/trigram/explode chain on one core (guide §2.5
    # input skew); no-op at scale
    tg = ensure_kernel_parallelism(docs).select(
        F.col(id_col),
        F.explode(F.array_distinct(doc_trigrams(F.col(text_col))))
        .alias("g"),
    )
    # pair generation from per-trigram buckets — the winnow/LSH
    # group-and-explode restructure (r11 changes 3/10) transplanted:
    # the old form counted df with one groupBy, semi-joined the rare
    # set back, and SELF-JOINED the (id, g) rows on g — two extra
    # shuffles of every trigram row plus two checkpoint barriers (tg
    # had two consumers, tr fed both join sides). Here the df count
    # is a window over partitionBy(g) (WindowExec spills its group
    # buffer, so the Zipf-head trigrams that appear in most documents
    # never build an in-memory corpus-sized state — a bare
    # groupBy+collect_list WOULD, which is the unbounded-bucket
    # hazard that kept simhash/phash as self-joins in r11), the rare
    # filter drops the head BEFORE any list exists, and only the
    # surviving buckets — bounded at max_df ids (<= 5 by default,
    # ~40 bytes) — are collected. The window's exchange already
    # clusters by g, so the collect aggregation adds NO exchange:
    # the chain is scan -> ONE exchange -> sort/window -> filter ->
    # agg -> explode, with no lineage cuts. ids are distinct per
    # bucket (one row per doc_id upstream, trigrams array_distinct'd
    # per doc), so slice-pairing emits exactly the a < b pairs and
    # the per-pair count is the shared-trigram count, as before.
    from pyspark.sql import Window

    df_w = F.count(F.lit(1)).over(Window.partitionBy("g"))
    buckets = (
        tg.withColumn("__df", df_w)
        .filter((F.col("__df") >= min_df) & (F.col("__df") <= max_df))
        .groupBy("g")
        .agg(F.sort_array(F.collect_list(id_col)).alias("__ids"))
    )
    lhs = buckets.select(
        "__ids", F.posexplode("__ids").alias("__i", "a"))
    pairs = lhs.select(
        "a",
        F.explode(
            F.slice("__ids", F.col("__i") + F.lit(2), F.size("__ids"))
        ).alias("b"))
    if weighted:
        return pairs.groupBy("a", "b").agg(
            F.count(F.lit(1)).alias("w"))
    return pairs.select("a", "b").distinct()


def _symmetric(edges: DataFrame,
               weight_col: str | None = None) -> DataFrame:
    """Both directions of an (a, b[, w]) edge list, checkpointed once
    (every round re-scans it; the checkpoint persists on first
    compute, so the edge derivation runs once however many rounds
    consume it)."""
    extra = ([F.col(weight_col).alias("__w")] if weight_col else [])
    return (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"),
                     *extra)
        .unionByName(
            edges.select(F.col("b").alias("src"),
                         F.col("a").alias("dst"), *extra))
        .localCheckpoint(eager=False)
    )


def pagerank_scaled(edges: DataFrame, rounds: int = 4,
                    damping_pct: int = 85,
                    scale: int = 1_000_000,
                    seeds: DataFrame | None = None,
                    weight_col: str | None = None) -> DataFrame:
    """Degree-normalized PageRank in exact scaled-integer arithmetic.

    r_0(v) = scale; r_{t+1}(v) = floor(scale * (100-damping)/100)
    + sum over in-neighbors u of floor(damping * r_t(u) / (100 *
    deg(u))). All int64 (floor-div mass splitting loses < deg(u)
    units per node per round — the quantization that buys engine-exact
    replay), so the trajectory is partition-invariant and the T-round
    result unrolls into SQL CTEs. Bounds: total mass stays <= n *
    scale, so damping * r fits int64 up to ~10^11 nodes at the default
    scale. Returns (node, degree, rank_scaled).

    Undirected graph: every node has deg >= 1, so there are no
    dangling nodes and the mass redistribution term is unnecessary.

    seeds: optional one-column (node) frame — switches to SEEDED
    personalized PageRank (the TrustRank shape, Gyongyi et al. 2004:
    propagate quality from a trusted seed set instead of uniformly):
    r_0(v) = scale for seeds / 0 otherwise, and the per-round reset
    mass lands only on seeds. Same exact-integer trajectory; the
    skew story is unchanged (the per-dst SUM is map-side partially
    aggregated, so a hub node receives ~n_partitions partial rows,
    not its full in-degree).

    weight_col: optional integer edge-weight column — edge (u, v)
    receives w_uv * s_u where s_u = floor(damping * r_u / (100 *
    W_u)) is u's PER-UNIT share and W_u = sum of u's edge weights.
    Quantizing the per-unit share FIRST (rather than
    floor(damping * r * w / (100 * W))) keeps every product under
    damping * r / 100 regardless of weight magnitude — no int64
    overflow for any corpus — at the cost of losing < W_u units of
    mass per node per round (the same class of quantization the
    unweighted floor-div already accepts).
    """
    if not 0 < damping_pct < 100:
        raise ValueError(
            f"damping_pct={damping_pct} must be in (0, 100): 100 has "
            "no reset mass (the seeded path would mark no seeds) and "
            "0 is the reset alone")
    sym = _symmetric(edges, weight_col)
    w = F.col("__w").cast("long")  # internal alias: caller's weight
    deg_agg = (F.sum(w) if weight_col
               else F.count(F.lit(1))).alias("deg")
    deg = sym.groupBy("src").agg(deg_agg) \
        .withColumnRenamed("src", "node").localCheckpoint(eager=False)
    base = scale * (100 - damping_pct) // 100
    # attach deg to the edge frame ONCE and compute the floor-div
    # share edge-side: floor(damping * r / (100 * deg)) is a pure
    # integer function of (r, deg), so evaluating it per edge row is
    # bit-identical to computing it once per src and joining — and it
    # removes the r-to-deg join (one shuffle + one stage barrier) from
    # EVERY round (guide §2.1/§3.1). One extra upfront join against
    # the (bounded) degree frame pays for itself from rounds >= 2.
    symd = sym.join(deg.withColumnRenamed("node", "src"), "src") \
        .localCheckpoint(eager=False)
    share = F.expr(f"({damping_pct} * r) div (100 * deg)")
    contrib = (w * share if weight_col else share)
    # NO per-round lineage cut: the rounds stay in ONE plan so the
    # four identical symd-side Exchange subtrees collapse into one
    # shuffle + ReusedExchange (a per-round localCheckpoint severs the
    # subtree identity and re-shuffles the EDGE frame every round —
    # measured 1.9 vs 1.2 s at sf0.1, and at scale the reused exchange
    # saves rounds-1 shuffles of the corpus-sized edge frame). The
    # trajectory is partition-invariant exact-integer math, so the
    # result is bit-identical either way; plan growth is linear in the
    # round count and the upstream is already cut at symd/deg —
    # `rounds` is caller-supplied, so every _CUT_EVERY rounds the rank
    # frame's lineage is cut to cap analyzer/optimizer depth (a no-op
    # at the default 4; the intra-window ReusedExchange win is kept).
    if seeds is None:
        # uniform reset: every node receives base each round, so the
        # loop needs no per-node reset frame (one join fewer per round
        # than the seeded path)
        r = deg.select("node", F.lit(scale).cast("long").alias("r"))
        for t in range(rounds):
            r = (
                symd.join(r.withColumnRenamed("node", "src"), "src")
                .groupBy("dst")
                .agg((F.lit(base) + F.sum(contrib)).alias("r"))
                .select(F.col("dst").alias("node"), "r")
            )
            if (t + 1) % _CUT_EVERY == 0 and t + 1 < rounds:
                r = r.localCheckpoint(eager=False)
        return r.join(deg, "node").select(
            "node", "deg", F.col("r").alias("rank_scaled"))

    seed_col = seeds.columns[0]
    bases = deg.join(
        F.broadcast(seeds.select(F.col(seed_col).alias("node"))
                    .distinct().withColumn("__s", F.lit(True))),
        "node", "left").select(
        "node",
        F.when(F.coalesce(F.col("__s"), F.lit(False)), F.lit(base))
        .otherwise(F.lit(0)).cast("long").alias("__base"),
    ).localCheckpoint(eager=False)
    # r_0 = scale on seeds, 0 elsewhere
    r = bases.select(
        "node",
        F.when(F.col("__base") > 0, F.lit(scale)).otherwise(F.lit(0))
        .cast("long").alias("r"))
    for t in range(rounds):
        r = (
            symd.join(r.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(contrib).alias("__in"))
            .select(F.col("dst").alias("node"), "__in")
            .join(bases, "node", "right")
            .select("node",
                    (F.col("__base") + F.coalesce("__in", F.lit(0)))
                    .alias("r"))
        )
        if (t + 1) % _CUT_EVERY == 0 and t + 1 < rounds:
            r = r.localCheckpoint(eager=False)
    return r.join(deg, "node").select(
        "node", "deg", F.col("r").alias("rank_scaled"))


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) made
    deterministic: node labels start as the node id; each round every
    node adopts its neighbors' MODE label with a total-order tie-break
    (highest vote count, then smallest label). The tie-break removes
    the classic LP nondeterminism, so T rounds are a pure function of
    the edge set — partition-invariant and SQL-replicable. Returns
    (node, community) after `rounds` rounds."""
    sym = _symmetric(edges)
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("lab", F.col("node"))
    )
    for t in range(rounds):
        votes = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src", "lab").agg(F.count(F.lit(1)).alias("c"))
        )
        # mode with (max c, then min lab) tie-break, expressed as
        # min(struct(-c, lab)) so it is map-side-partially
        # aggregable: at round 1 every neighbor of a hub carries a
        # DISTINCT label, so a per-src row_number window would funnel
        # deg(hub) vote rows into ONE window partition — this agg
        # keeps the hub's reducer at ~n_partitions partial rows
        # instead (same skew story as the PageRank per-dst SUM;
        # negating c, a count >= 1, never overflows, unlike negating
        # a user-supplied label id).
        # same single-plan discipline as pagerank_scaled: no per-round
        # lineage cut, so the sym-side exchange is shuffled once and
        # reused across rounds (ReusedExchange)
        labels = (
            votes.groupBy("src")
            .agg(F.min(F.struct(
                F.negate(F.col("c")).alias("nc"),
                F.col("lab").alias("lab"))).alias("__m"))
            .select(F.col("src").alias("node"),
                    F.col("__m.lab").alias("lab"))
        )
        if (t + 1) % _CUT_EVERY == 0 and t + 1 < rounds:
            labels = labels.localCheckpoint(eager=False)
    return labels.select("node", F.col("lab").alias("community"))


def web_link_edges(pages: DataFrame, id_col: str = "doc_id",
                   base_col: str = "base",
                   html_col: str = "html") -> DataFrame:
    """Undirected distinct (a, b) edge list of the REAL web link
    graph: resolve + canonicalize every anchor href, join against the
    pages' own canonical URLs (dangling links drop), symmetrize by
    (least, greatest). The anchor-extracted counterpart of
    rare_trigram_edges; feeds pagerank_scaled / label_propagation
    unchanged. Shared by plans/queries_web.py::web_link_pagerank and
    the incremental twin streaming/web_graph.py."""
    from hummingbird_spark.functions.html import (
        canonical_url,
        extract_links,
    )
    from hummingbird_spark.operators.dedup import ensure_kernel_parallelism

    # anchor extraction + canonicalization is the CPU-heavy part; a
    # single-partition page frame would serialize it (guide §2.5)
    pages = ensure_kernel_parallelism(pages)
    links = pages.select(
        id_col,
        F.explode(extract_links(F.col(html_col), F.col(base_col)))
        .alias("url"),
    ).select(id_col, canonical_url(F.col("url")).alias("curl"))
    targets = pages.select(
        canonical_url(F.col(base_col)).alias("curl"),
        F.col(id_col).alias("tgt"))
    return (
        links.join(targets, "curl")
        .filter(F.col(id_col) != F.col("tgt"))
        .select(F.least(id_col, "tgt").alias("a"),
                F.greatest(id_col, "tgt").alias("b"))
        .distinct()
    )
