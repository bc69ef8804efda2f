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


def test_ivf_recall_vs_bruteforce_on_clustered_data(spark):
    """IVF's exactness is oracle-checked (the DuckDB twin applies the
    same pruning); this gates its QUALITY where IVF's assumption holds —
    data with cluster structure.  8 well-separated clusters, centroids
    seeded from the first 16 ids (cluster = id % 8, so every cluster has
    a seed); a probe's true nearest neighbors live in its own cluster,
    and nprobe=2 must recover nearly all of the unpruned top-5."""
    import numpy as np

    from ocr_spark.plans.queries_vec import ivf_topk

    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 64)).astype("float32") * 4
    n = 160
    rows = [
        (i, (centers[i % 8] + rng.standard_normal(64).astype("float32") * 0.3).tolist())
        for i in range(n)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes_src = e.filter(F.col("vec_id") % 20 == 19)
    got = {(r["probe_id"], r["neighbor_id"])
           for r in ivf_topk(e, probes_src, k=16, nprobe=2, topk=5).collect()}
    assert got, "IVF returned nothing"

    from pyspark.sql import Window as W
    p = probes_src.select(F.col("vec_id").alias("probe_id"),
                          F.col("embedding").alias("pe"))
    cos = (
        F.expr(_DOT.format(a="pe", b="embedding"))
        / (F.sqrt(F.expr(_NORM2.format(a="pe")))
           * F.sqrt(F.expr(_NORM2.format(a="embedding"))))
    )
    scored = (F.broadcast(p).join(e, F.col("vec_id") != F.col("probe_id"))
              .select("probe_id", F.col("vec_id").alias("neighbor_id"),
                      cos.alias("c")))
    w = W.partitionBy("probe_id").orderBy(F.desc("c"), "neighbor_id")
    truth = {
        (r["probe_id"], r["neighbor_id"])
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"IVF recall on clustered data too low: {recall:.2f}"


def _clustered(spark, n=160, n_clusters=8, seed=7):
    import numpy as np

    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, 64)).astype("float32") * 4
    rows = [
        (i, (centers[i % n_clusters]
             + rng.standard_normal(64).astype("float32") * 0.3).tolist())
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_fitted_centroids_recall(spark):
    """The k-means fit must make the recall gate meaningful on real
    cluster structure: fitted centroids land one-per-cluster (vs the
    first-K stub, whose coverage of the clusters is accidental), so
    nprobe=2 pruning keeps ≥0.9 of the unpruned top-5 — and the fit is
    a pure function of (data, seed): two fits are identical."""
    from pyspark.sql import Window as W

    from ocr_spark.plans.queries_vec import fit_centroids_kmeans, ivf_topk

    e = _clustered(spark)
    cents = fit_centroids_kmeans(e, k=8, seed=7)
    again = fit_centroids_kmeans(e, k=8, seed=7)
    assert sorted(map(tuple, cents.collect())) == sorted(map(tuple, again.collect())), (
        "k-means fit is not deterministic")

    probes_src = e.filter(F.col("vec_id") % 20 == 19)
    got = {(r["probe_id"], r["neighbor_id"])
           for r in ivf_topk(e, probes_src, k=8, nprobe=2, topk=5,
                             cents=cents).collect()}
    p = probes_src.select(F.col("vec_id").alias("probe_id"),
                          F.col("embedding").alias("pe"))
    cos = (
        F.expr(_DOT.format(a="pe", b="embedding"))
        / (F.sqrt(F.expr(_NORM2.format(a="pe")))
           * F.sqrt(F.expr(_NORM2.format(a="embedding"))))
    )
    scored = (F.broadcast(p).join(e, F.col("vec_id") != F.col("probe_id"))
              .select("probe_id", F.col("vec_id").alias("neighbor_id"),
                      cos.alias("c")))
    w = W.partitionBy("probe_id").orderBy(F.desc("c"), "neighbor_id")
    truth = {
        (r["probe_id"], r["neighbor_id"])
        for r in scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"fitted-IVF recall too low: {recall:.2f}"


def test_ivf_assignment_plan_has_no_window(spark):
    """The corpus-side centroid assignment must reduce via max_by partial
    aggregation — a Window node there means the n×K affinity rows are
    being shuffled and sorted per vector (the round-2 plan)."""
    from ocr_spark.plans.queries_vec import ivf_assign

    e = _clustered(spark)
    cents = F.broadcast(e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")))
    plan = ivf_assign(e, cents)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan or "max_by" in plan, plan


def test_dedup_semantic_removes_planted_keeps_originals(spark, sf_dir):
    """SemDeDup contract: every planted exact copy (vec_id >= 1e6) is
    removed, every original survives (random 64-dim gaussians cannot
    reach cosine 0.99), and the assignment column is a valid centroid
    id.  Also pins the plan shape: assignment must be the max_by hash
    agg (no Window over the corpus scan subtree)."""
    from ocr_spark.plans import registry
    registry.load_all()

    df = registry.QUERIES["dedup_semantic"](spark, sf_dir)
    rows = df.collect()
    planted = [r for r in rows if r["vec_id"] >= 1_000_000]
    originals = [r for r in rows if r["vec_id"] < 1_000_000]
    assert planted and originals
    assert all(not r["kept"] for r in planted), "an exact copy survived"
    assert all(r["kept"] for r in originals), "a unique original was dropped"
    # planted copy sits in the same cluster as its original
    comp = {r["vec_id"]: r["cid"] for r in rows}
    assert all(comp[r["vec_id"]] == comp[r["vec_id"] - 1_000_000]
               for r in planted)
