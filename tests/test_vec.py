"""ANN / similarity-search gates for the rows-only vector operators.

The oracle harness proves the SQL-expressible vector ops; the seeded
LSH path gets recall/precision properties instead: exact duplicates
always collide (identical sketch), the emitted set is exactly verified
(precision 1.0 vs brute force), and perturbed near-duplicates are
recovered at high rate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.plans.queries_vec import _DOT, _NORM2, lsh_pairs


def _planted(spark, n=120, dim=64, n_dups=40, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n, dim)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(n)]
    # exact copies
    rows += [(i + 1_000_000, base[i].tolist()) for i in range(n_dups)]
    # slightly perturbed near-dups (cosine ≈ 0.995)
    noise = rng.standard_normal((n_dups, dim)).astype("float32") * 0.05
    rows += [(i + 2_000_000, (base[i] + noise[i]).tolist()) for i in range(n_dups)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_lsh_exact_duplicate_recall_and_precision(spark):
    df = _planted(spark)
    got = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in lsh_pairs(df).collect()}

    # recall: every exact duplicate MUST collide (identical sketch)
    missing = [i for i in range(40) if (i, i + 1_000_000) not in got]
    assert not missing, f"LSH missed exact duplicates: {missing[:5]}"
    for i in range(40):
        assert got[(i, i + 1_000_000)] >= 0.999999

    # precision: every emitted pair's cosine really is >= threshold
    # (verified exactly inside the operator; re-check independently)
    a = df.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = df.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = (
        F.expr(_DOT.format(a="ea", b="eb"))
        / (F.sqrt(F.expr(_NORM2.format(a="ea"))) * F.sqrt(F.expr(_NORM2.format(a="eb"))))
    )
    brute = {
        (r["vec_a"], r["vec_b"])
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("c"))
        .filter(F.col("c") >= 0.6 - 1e-9).collect()
    }
    assert set(got) <= brute, "LSH emitted a pair below the cosine threshold"


def test_lsh_near_duplicate_recall(spark):
    df = _planted(spark)
    got = {(r["vec_a"], r["vec_b"]) for r in lsh_pairs(df).collect()}
    # 5%-noise near-dups (cosine ≈ 0.995): a 16-bit sign sketch collides
    # with prob ≈ (1 - θ/π)^16 ≈ 0.6-0.8 — require a healthy fraction,
    # not all (that's what banding/multi-probe would add)
    hits = sum((i, i + 2_000_000) in got for i in range(40))
    assert hits >= 15, f"near-dup recall collapsed: {hits}/40"
