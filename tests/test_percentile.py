"""Percentile-family gates.

``agg_percentile`` (exact, distinct-value counting) is covered by the
DuckDB oracle suite; here we assert its SCALE property — the plan must
not contain Spark's buffering ``percentile``/unbounded
``percentile_approx`` aggregate — plus the rank-error tolerance of the
bounded-accuracy ``agg_percentile_approx`` sketch against the exact
values, and the hot-gram candidate cap of dedup_ngram_jaccard.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.plans import registry
from ocr_spark.plans.queries_text import ngram_candidates

registry.load_all()


def test_exact_percentile_plan_has_no_buffering_agg(spark, sf_dir):
    plan = (registry.QUERIES["agg_percentile"](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "percentile" not in plan.lower(), (
        "agg_percentile must use the distinct-value-counting shape, not a "
        "per-group buffering percentile aggregate")


def test_percentile_approx_brackets_all_true(spark, sf_dir):
    """The registered query emits the GK-in-exact-bracket containment as
    booleans (its DuckDB oracle states them as literal ``true``); every
    group must satisfy the guarantee."""
    rows = registry.QUERIES["agg_percentile_approx"](spark, sf_dir).collect()
    assert rows and all(r["p50_ok"] and r["p95_ok"] for r in rows), rows


def test_percentile_approx_rank_error_bounded(spark, sf_dir):
    """GK guarantee: returned value's true rank within n/accuracy of the
    target rank.  Check value-space: approx p must sit between the exact
    percentiles at p ± 2·(1/accuracy) (slack 2x for float rounding).
    Computed directly on lineitem — independent of the registered
    query's own bracket construction."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    df = li.groupBy("l_returnflag").agg(
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("p50"),
        F.expr("percentile_approx(l_extendedprice, 0.95, 10000)").alias("p95"),
    )
    approx = {r["l_returnflag"]: (r["p50"], r["p95"]) for r in df.collect()}
    sizes = {r["l_returnflag"]: r["n"]
             for r in li.groupBy("l_returnflag").count().withColumnRenamed(
                 "count", "n").collect()}
    for flag, n in sizes.items():
        # rank tolerance: sketch guarantee n/accuracy, plus 2 ranks of
        # slack for the ±1-rank discretization at both ends
        eps = (2.0 + n / 10000.0) / n
        for p, idx in ((0.5, 0), (0.95, 1)):
            r = li.filter(F.col("l_returnflag") == flag).agg(
                F.expr(f"percentile(l_extendedprice, {max(p - eps, 0.0)})").alias("lo"),
                F.expr(f"percentile(l_extendedprice, {min(p + eps, 1.0)})").alias("hi"),
            ).collect()[0]
            got = approx[flag][idx]
            assert r["lo"] - 0.01 <= got <= r["hi"] + 0.01, (
                f"p{int(p*100)} for {flag}: {got} outside [{r['lo']}, {r['hi']}]")


def test_ngram_df_cap_bounds_hot_gram_candidates(spark):
    """A gram shared by every doc must not generate O(n²) candidate
    pairs.  100 docs, all sharing one hot gram, each also carrying one
    unique gram + one gram shared with its dup partner: with the cap the
    candidates are exactly the 50 planted pairs; uncapped they explode
    to ~n²/2."""
    n = 100
    rows = []
    for i in range(n):
        planted = f"pair{i // 2}"          # shared by docs 2k and 2k+1
        rows.append((i, ["HOT gram here", f"unique {i} gram", f"{planted} gram x"]))
    g = spark.createDataFrame(rows, "doc_id long, gset array<string>")
    capped = ngram_candidates(g, cap=8).count()
    uncapped = ngram_candidates(g, cap=10**9).count()
    assert capped == n // 2, f"expected {n//2} planted pairs, got {capped}"
    assert uncapped == n * (n - 1) // 2, "fixture should be quadratic uncapped"


def test_ngram_cap_keeps_planted_dup_pairs(spark, sf_dir):
    """End-to-end: every planted exact-dup pair survives the capped
    candidate generation (each doc shares ALL its grams with its copy,
    and at least one is rare)."""
    from ocr_spark.plans.queries_text import DUP_SHIFT, _grams_df

    pairs = registry.QUERIES["dedup_ngram_jaccard"](spark, sf_dir)
    got = {(int(r["doc_a"]), int(r["doc_b"])) for r in pairs.collect()}
    g = _grams_df(spark, sf_dir).filter(F.size("gset") > 0)
    planted = {int(r["doc_id"]) for r in g.filter(F.col("doc_id") < DUP_SHIFT).collect()}
    missing = {(i, i + DUP_SHIFT) for i in planted} - got
    assert not missing, f"df cap lost {len(missing)} planted dup pairs"
