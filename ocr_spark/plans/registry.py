"""Query registry: named DataFrame builders + matching DuckDB oracle SQL.

Driver contract (__spark_entry__.py): every operator from SURVEY.md §2
is exposed as ``queries()[name]`` (spark, sf_dir) → DataFrame, with an
equivalent ANSI-SQL ``oracle_sql()[name]`` where SQL-expressible; the
driver compares row-count + schema + order-insensitive value hash at
sf0.01.  Column-name parity and in-query rounding of float aggregates
(so both engines emit the identical canonical value) are handled at
definition site.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → driver does a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# The driver's CORRECTNESS check walks queries() in registration order and
# covered only the first 50 entries in round 1 (CORRECTNESS_r01.json), so
# everything registered after `map_funcs` got no driver row despite being
# oracle-green in tests/.  Registration order is therefore an explicit,
# reviewed list: operators with no driver row yet come FIRST (so round 2
# verifies them), then entries whose implementation changed this round,
# then rows-only sketches, then the operators already driver-verified in
# round 1 (their r01 rows stand; the in-repo oracle-parity suite re-checks
# all of them every run regardless).
_CHECK_PRIORITY = [
    # -- no driver row yet (r01 cutoff) — oracle-backed --
    "map_funcs", "pivot_wide", "events_tumbling_window",
    "events_sliding_window", "events_sessionize", "agg_salted_twophase",
    "join_bucketed", "filter_null_safe", "join_right_outer",
    "grouped_map_zscore", "text_token_count", "text_lang_id",
    "text_quality_score", "text_fingerprint", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "vec_array_hof",
    "ann_bruteforce_topk", "vec_cosine_neardup", "vec_centroids",
    # -- new or reworked this round --
    "udf_scalar_pandas", "agg_percentile", "agg_percentile_approx",
    "extract_split_restitch", "ann_ivf_topk",
    "sample_deterministic", "split_train_holdout", "sample_cap_per_source",
    "vocab_topk", "pack_token_budget", "decontaminate_vs_holdout",
    "text_pii_scrub", "text_repetition_score",
    "sink_roundtrip_orc", "streaming_static_join",
    "streaming_stream_stream_join", "window_range_frame",
    # -- no driver row yet — rows-only by design --
    "dedup_simhash", "ann_lsh_bucketed",
]
#: round-1 rows-only entries (already have their rows-only row) — last.
_ROWS_ONLY_DONE = [
    "extract_pipeline", "multimodal_decode_stub", "multimodal_frame_sample",
    "agg_approx_count_distinct",
]


def load_all() -> None:
    """Import every query module (side effect: fills QUERIES/ORACLES),
    then reorder into the explicit driver-check priority above."""
    from ocr_spark.plans import (  # noqa: F401
        queries_data,
        queries_extract,
        queries_more,
        queries_rel,
        queries_text,
        queries_vec,
    )
    rank = {n: i for i, n in enumerate(_CHECK_PRIORITY)}
    tail = {n: i for i, n in enumerate(_ROWS_ONLY_DONE)}
    orig = {n: i for i, n in enumerate(QUERIES)}
    names = sorted(QUERIES, key=lambda n: (
        (0, rank[n]) if n in rank
        else (2, tail[n]) if n in tail
        else (1, orig[n])))
    for d in (QUERIES, ORACLES):
        ordered = {n: d[n] for n in names if n in d}
        d.clear()
        d.update(ordered)
