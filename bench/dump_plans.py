"""Regenerate BENCH/PLANS.md — physical-plan evidence for key operators.

Each pick demonstrates one scale property the engine is designed around
(pushdown, broadcast, bucketed co-location, partial aggregation, top-k,
UDF-free sketches).  Run: ``python bench/dump_plans.py``.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PICKS = {
    "scan_filter_prune": "predicate + projection pushdown into the parquet scan",
    "join_broadcast": "small dimension broadcast (no shuffle of the fact side)",
    "join_bucketed": "bucketed co-located SortMergeJoin — zero Exchange on either join side",
    "tpch_q1": "partial (map-side) + final hash aggregation",
    "sort_limit_topk": "global top-k as TakeOrderedAndProject (no full sort)",
    "dedup_simhash": "pure-JVM sketch: no Python stage anywhere",
    "agg_percentile": "exact percentile via distinct-value counting — partial agg, bounded per-group state (no buffering percentile())",
    "ann_ivf_topk": "IVF ANN: broadcast centroid assignment via map-side max_by (no Window over the corpus join), cluster-pruned exact scoring",
    "join_salted_skew": "salted skew join: replicated dim x salted fact on (key, salt)",
    "dedup_apply_keep_best": "keep-best dedup apply: one max_by hash agg, no window over copies",
    "events_funnel": "ordered-step funnel: ONE hash exchange feeding stacked Window nodes (no per-step self-joins)",
    "dedup_ngram_jaccard": "count-filtering candidate bound: pair-count agg prunes before the array-verify join",
    "text_unigram_logprob": "two-pass corpus-LM scoring: vocab agg then BROADCAST log-prob re-attach (the corpus is never shuffled)",
    "filter_domain_blocklist": "blocklist as BroadcastHashJoin LeftAnti — zero corpus shuffle",
    "zorder_cluster_key": "Morton interleave entirely inside WholeStageCodegen — no exchange, no Python",
    "dedup_substring_window": "substring dedup: JVM HOF window hashes, df-capped narrow self-join — no arrays across the join",
    "url_canonicalize": "URL normalizer fully inside WholeStageCodegen — zero exchange, zero Python",
    "filter_bloom_negative": "Bloom semi-join reduction: constant-size bitmap broadcast probes the corpus; exact verify only on candidates",
    "join_range_bucketed": "range join as bucket-grid EQUI join + residual filter — survives when neither side broadcasts",
    "dedup_url_keep_first": "URL keep-first dedup: ONE map-side-combined hash agg — no window, no self-join",
    "sample_importance_weighted": "weighted Bernoulli sampling as a stateless codegen filter — zero exchange",
    "vocab_top_bigram_merges": "BPE merge selection: HOF bigram build, partial-agg counts, TakeOrderedAndProject top-k",
    "dedup_minhash_recall": "production-threshold MinHash: int64 gram sets, narrow band join, slim verify re-attach",
    "text_bm25_topk": "BM25: tf/dl partial aggs, broadcast query-term + corpus-stats frames, per-term window only",
    "vec_quantize_int8": "int8 embedding quantization entirely inside WholeStageCodegen — zero exchange, zero Python",
    "events_attribution": "first/last-touch attribution: min_by/max_by hash aggs keyed on user_id — two shuffles, no windows over raw events",
    "dedup_semantic": "SemDeDup: broadcast centroid assign (max_by agg), within-cluster pair join on cid — never all-pairs",
    "tpch_q3": "star join: pushed date/segment filters, broadcast dims, single fact scan",
    "events_downsample_ohlc": "OHLC bars in ONE hash agg: min_by/max_by composite time key, map-side partials, no window over raw events",
    "filter_quality_gate": "C4 quality rules as integer cross-comparisons — whole-stage codegen, zero exchange",
    "text_bigram_logprob": "bigram LM score: two map-side-combined passes, micro-nat fixed-point re-attach join",
    "dedup_incremental_vs_corpus": "incremental crawl dedup: md5 semi-match + df-capped batch-x-corpus inverted-index join, slim verify re-attach",
    "tpch_q6": "pure-scan aggregate: every predicate pushed to parquet, one exchange, zero joins",
    "tpch_q19": "disjunctive (brand,size,qty) residual — equi key stays clean, hash join survives",
    "graph_triangle_count": "degree-ordered triangle closure as pure equi-joins (no NestedLoop from OR-of-orientations)",
    "sample_fixed_k": "exactly-k hash-order sample as TakeOrderedAndProject — per-partition k-heap, no global sort",
    "events_sliding_distinct": "sliding windows via in-task Generate fan-out + two-phase exact distinct",
    "events_markov_transitions": "transition matrix from ONE event scan: lag window + agg, normalization windows the aggregated frame",
    "agg_cms_heavy_hitters": "Count-Min sketch: in-task x4 explode, <=256-cell agg state, broadcast probe join",
    "dedup_containment": "sub-document containment: recall-complete rarest-gram prefix filter bounds candidates, pre-hashed int64 gram verify",
    "join_interval_overlap": "interval-overlap join as a week-bucket EQUI join — bounded explode fanout, overlap-start allocation dedups without distinct",
    "agg_weighted_median": "weighted median: window cum-sum and final MIN share ONE group-key exchange",
    "sample_temperature": "alpha-power source rebalancing: broadcast count frame, integer accept test — the corpus scan never shuffles",
    "events_gap_islands": "gaps-and-islands streaks: distinct, rank window, island agg all on ONE key family — no joins",
    "graph_common_neighbors": "link-prediction wedge counts: one adjacency self-equi-join + map-side-combined pair count",
}


def main() -> None:
    from ocr_spark.session import get_spark
    from ocr_spark.plans import registry

    spark = get_spark("dump_plans", master="local[8]", shuffle_partitions=8)
    registry.load_all()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    out = ["# PLANS — physical-plan evidence for key operators\n",
           f"Generated from `df.explain('formatted')` at {os.path.basename(sf)} (local[8]).",
           "Regenerate: `python bench/dump_plans.py`.\n"]
    for name, why in PICKS.items():
        df = registry.QUERIES[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        head, _, detail = plan.partition("\n\n")
        keep = []
        for para in detail.split("\n\n"):
            if any(k in para for k in ("PushedFilters", "ReadSchema", "Bucketed")):
                keep.append("\n".join(
                    l for l in para.splitlines()
                    if any(k in l for k in ("Scan", "PushedFilters", "ReadSchema",
                                            "Bucketed", "Location"))
                    or l.startswith("(")
                ))
        out.append(f"## {name}\n\n*{why}*\n\n```\n{head.strip()}\n")
        if keep:
            out.append("\n".join(keep[:3]))
        out.append("```\n")
    with open(os.path.join(REPO, "BENCH", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
