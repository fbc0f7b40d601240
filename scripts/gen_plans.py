import sys, io
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hummingbird_spark.plans.queries import QUERIES
from hummingbird_spark.session import get_spark
from contextlib import redirect_stdout

spark = get_spark(); spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

PICKS = {
    "pricing_summary": "flagship agg: filter pushdown + partial/final hash agg",
    "range_scan": "range predicate lands in PushedFilters (S2 block copy shape)",
    "revenue_by_nation": "star join: 3 broadcast dims + one shuffle join",
    "shipping_priority": "TPC-H Q3 shape: pushdown on both join sides + TakeOrdered",
    "mask_default": "masking is a pure projection (no Python, no shuffle)",
    "minhash_dups": "dedup: explode + 16 MIN aggs + band-bucket self-join",
    "asof_attribution": "as-of via union + single window sort per key",
    "win_session": "session windows: one shuffle on the grouping key",
    "small_qty_revenue": "Q17 shape: scalar subquery decorrelated to a window",
    "big_orders": "Q18 shape: HAVING-filtered agg broadcast into the join",
    "idle_balance": "Q22 shape: 1-row scalar broadcast + left anti join",
    "grouping_sets": "GROUPING SETS: one Expand + single hash agg pass",
    "events_time_slice": "nanos-domain time range lands in PushedFilters",
    "custdist": "Q13 shape: outer join feeding a two-level aggregation",
    "forecast_revenue": "Q6 shape: every predicate pushed, one exchange total",
    "order_priority_check": "Q4 shape: EXISTS as LeftSemi broadcast join",
    "supplier_variety": "Q16 shape: distinct triples dedup before the shuffle",
    "disjunctive_revenue": "Q19 shape: OR-of-ANDs derives per-side pushdown",
    "local_supplier_volume": "Q5 shape: broadcast dim chain, one agg shuffle",
    "tfidf_dup_pairs": "inverted-index sparse matmul: term-bucketed self-join",
    "nation_trade_flow": "Q7 shape: per-side IN derivation prunes both dims",
    "corpus_curation": "curation pipeline: staged scan + broadcast keep set",
    "salted_status_counts": "skew salting: (key,salt) then key, two phases",
    "min_cost_supplier": "Q2 shape: correlated MIN as window over the join",
    "market_share": "Q8 shape: conditional agg, 5 broadcast dims, 1 shuffle",
    "important_stock": "Q11 shape: scalar HAVING via 1-row broadcast, "
                       "exchange reuse on the rollup",
    "waiting_suppliers": "Q21 shape: EXISTS pair as one per-order aggregate",
    "funnel_steps": "chained per-user window mins share one exchange",
    "seg_first_last": "broadcast dim + two rankings over one shuffle",
    "corr_price_qty": "algebraic corr: single partial+final hash agg",
    "running_revenue": "decimal-exact running sum over the monthly rollup",
    "first_order_gap": "WindowGroupLimit prunes top-2 map-side pre-shuffle",
    "events_sessionized": "sessionize: lag+cumsum+agg share one exchange",
    "supplier_fill_rate": "fact-fact join + broadcast dim, TakeOrdered 25",
    "minhash_signature_probe": "LSH skew probe: explode + two-level agg",
    "decile_stats": "global ntile: one range sort (exact-quantile class)",
    "keep_newest_orders": "distributed top-N: range partition + "
                          "per-partition ranks, no global sort",
    "doc_chunks": "LM chunking rides the scan: spans + posexplode, "
                  "zero shuffle",
    "pipeline_expressions": "Mongo expression language compiles to "
                            "one partial/final decimal agg",
    "bm25_topk": "BM25: query-term postings only; DF + corpus scalars "
                 "broadcast; TakeOrdered top-k",
    "perplexity_outliers": "bigram LM: vocab_top_k-bounded model + "
                           "unseen table broadcast; scoring at raw "
                           "occurrence grain, one groupBy(id)",
    "segment_dup_stats": "segment dedup: only (id, md5) shuffles — "
                         "text never leaves the scan",
    "exact_substring_stats": "Lee-et-al substring dedup: in-scan window "
                             "hashes; first-keeper + island-merge reuse "
                             "two exchanges; per-doc agg rides the "
                             "second",
    "classifier_quality_mix": "hashed classifier rides the scan; one "
                              "rollup exchange total",
    "lm_data_prep": "filter -> chunk -> pack: one scan, one packing "
                    "window exchange",
    "vector_search_pipeline": "$vectorSearch exact path: projection + "
                              "TakeOrdered, no shuffle",
    # round-4 text-quality family
    "gopher_rule_stats": "Gopher A1 rules are pure projections riding "
                         "the scan; one rollup exchange total",
    "ngram_repetition_stats": "n-gram repetition: md5 keys shuffle, "
                              "gram text never leaves the explode",
    "boilerplate_stats": "cross-doc line dedup: lines shuffle as "
                         "16-hex hashes; doc-freq joins on its own key",
    # r5: DSIR targeted selection
    "dsir_logweights": "DSIR: staged gram counts feed model + scoring; "
                       "B-row model and totals broadcast",
    # r7: graph + perceptual hashing
    "link_pagerank": "df-capped shingle self-join builds the edge "
                     "list once (checkpointed); each round is two "
                     "equi-joins + one agg on node ids",
    "phash_near_dups": "integer-DCT pHash in one Arrow kernel; "
                       "8-band Hamming self-join buckets on (chunk, "
                       "ckey) — never all-pairs",
    # r8: web-crawl ingestion front end
    "html_main_text_stats": "HTML extraction is one zero-shuffle "
                            "array projection riding the scan "
                            "(blocks bound once per page)",
    "web_link_pagerank": "anchor links resolve + canonicalize in "
                         "the scan; edges via one curl equi-join; "
                         "PR rounds on checkpointed node frames",
    "robots_crawl_verdicts": "robots verdicts: one broadcast rules "
                             "join + one conditional-max aggregate "
                             "— the URL side shuffles exactly once "
                             "(the one SMJ is the bounded rules/"
                             "delay full outer)",
    # r9: delta frontier + RFC 9309 patterns ride the same picks;
    # sitemap_frontier gained the child-refs aggregate branch
    "sitemap_frontier": "structural per-<url> parse + child-ref "
                        "count; anti-join vs the crawled set",
}

out = ["# PLANS — executed-plan snapshots at sf0.1",
       "",
       "Generated by `python scripts/gen_plans.py` (re-runnable); asserts in",
       "`tests/test_plan_quality.py` pin the load-bearing properties.",
       ""]
for name, why in PICKS.items():
    df = QUERIES[name].spark(spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # keep the physical-plan section only, truncated for readability
    lines = plan.splitlines()
    head = [l for l in lines if l.strip()][:40]
    out.append(f"## {name}\n\n_{why}_\n\n```\n" + "\n".join(head) + "\n```\n")

open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w").write("\n".join(out))
print("wrote PLANS.md", len("\n".join(out)), "chars")
