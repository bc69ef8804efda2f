"""Similarity search / vector operators over the ``embeddings`` table.

ANN surface (task spec): brute-force cosine top-k as the exact baseline,
LSH-bucketed (random hyperplane) variant as the scale path, plus
embedding-cosine near-dup and per-label centroids.  Dot products stay
JVM-side via higher-order functions (zip_with/aggregate); the LSH sign
sketch uses one Arrow-vectorized numpy matmul per batch.

Float discipline: embeddings are array<float>; every oracle-checked
computation casts to double element-wise and both engines reduce
left-to-right over the list, then results are rounded in-query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Window as W, functions as F

from ocr_spark.plans.registry import q, t

# Spark-side double-precision dot product / norm via HOFs (JVM codegen)
_DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NORM2 = (
    "aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)

# DuckDB equivalents (same left-to-right reduction in double)
_DOT_SQL = (
    "list_sum(list_transform(generate_series(1, len({a})),"
    " i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)
_NORM2_SQL = (
    "list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)


@q(
    "vec_array_hof",
    oracle=f"""
    SELECT vec_id, label,
           CAST(len(embedding) AS INT) AS dim,
           ROUND(SQRT({_NORM2_SQL.format(a='embedding')}), 6) AS l2_norm,
           ROUND(list_sum(list_transform(embedding,
                 x -> CASE WHEN x > 0 THEN CAST(x AS DOUBLE) ELSE 0.0 END)), 6)
             AS pos_mass,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
    FROM embeddings
    """,
)
def vec_array_hof(spark, sf):
    # higher-order functions: transform / filter / aggregate on array<float>
    e = t(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(F.expr(_NORM2.format(a="embedding"))), 6).alias("l2_norm"),
        F.round(
            F.expr(
                "aggregate(transform(embedding, x -> CASE WHEN x > 0 THEN CAST(x AS DOUBLE)"
                " ELSE CAST(0.0 AS DOUBLE) END), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            ),
            6,
        ).alias("pos_mass"),
        F.size(F.expr("filter(embedding, x -> x > 0)")).alias("n_pos"),
    )


@q(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH probes AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings
                    WHERE vec_id < 5),
    scored AS (
      SELECT probe_id, e.vec_id AS neighbor_id,
             ROUND({_DOT_SQL.format(a='pe', b='e.embedding')}
                   / (SQRT({_NORM2_SQL.format(a='pe')})
                      * SQRT({_NORM2_SQL.format(a='e.embedding')})), 6) AS cosine
      FROM probes, embeddings e WHERE e.vec_id <> probe_id
    )
    SELECT probe_id, neighbor_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored) WHERE rn <= 10
    """,
)
def ann_bruteforce_topk(spark, sf):
    # exact ANN baseline: broadcast the probe set, score all pairs JVM-side,
    # per-probe top-k via window (TakeOrdered per group).  Norms are
    # computed ONCE per side before the join — recomputing |v| inside the
    # pair expression would redo the 64-element reduction per PAIR
    # (n_probes x n_vectors times instead of n_vectors times).
    e = t(spark, sf, "embeddings").select(
        "vec_id", "embedding",
        F.sqrt(F.expr(_NORM2.format(a="embedding"))).alias("nv"),
    )
    probes = F.broadcast(
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe"),
            F.col("nv").alias("np_"),
        )
    )
    scored = (
        probes.join(e, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.expr(_DOT.format(a="pe", b="embedding"))
                / (F.col("np_") * F.col("nv")),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "neighbor_id", "cosine")
    )


@q(
    "vec_cosine_neardup",
    oracle=f"""
    WITH dupe AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id < 50
    ),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             ROUND({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
                   / (SQRT({_NORM2_SQL.format(a='a.embedding')})
                      * SQRT({_NORM2_SQL.format(a='b.embedding')})), 6) AS cosine
      FROM dupe a JOIN dupe b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cosine FROM pairs WHERE cosine >= 0.95
    """,
)
def vec_cosine_neardup(spark, sf):
    # embedding-cosine near-duplicate detection over a corpus with planted
    # duplicates (vec_id+1e6 copies) — exact pairwise at test scale; the
    # LSH variant below is the subquadratic path
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    # cap the exact-pairwise corpus (O(n²)); planted duplicates on top
    dupe = e.filter(F.col("vec_id") < 300).unionByName(
        e.filter(F.col("vec_id") < 50).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    # norm once per VECTOR (pre-join), not once per PAIR
    dupe = dupe.withColumn("nv", F.sqrt(F.expr(_NORM2.format(a="embedding"))))
    a = dupe.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("ea"), F.col("nv").alias("na"))
    b = dupe.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("eb"), F.col("nv").alias("nb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b")).select(
        "vec_a",
        "vec_b",
        F.round(
            F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb")),
            6,
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= 0.95)


@q(
    "vec_centroids",
    oracle="""
    WITH comps AS (
      SELECT label,
             generate_subscripts(embedding, 1) AS pos,
             unnest(embedding) AS v
      FROM embeddings
    )
    SELECT label, CAST(pos - 1 AS INT) AS pos,
           ROUND(AVG(CAST(v AS DOUBLE)), 4) AS centroid_v
    FROM comps WHERE pos <= 4 GROUP BY label, pos
    """,
)
def vec_centroids(spark, sf):
    # per-label centroid components (first 4 dims): posexplode + hash agg
    e = t(spark, sf, "embeddings")
    comps = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    return (
        comps.filter(F.col("pos") < 4)
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 4).alias("centroid_v"))
    )


def lsh_pairs(df, dim: int = 64, n_bits: int = 16, min_cosine: float = 0.6,
              seed: int = 42):
    """Random-hyperplane LSH over a (vec_id, embedding) DataFrame:
    n_bits deterministic hyperplanes → sign sketch per vector (one numpy
    matmul per Arrow batch) → bucket join → EXACT cosine verification
    only within buckets (subquadratic scale path).  Precision is 1.0 by
    construction (every emitted pair is exactly verified); recall of
    exact/near duplicates is asserted in tests/test_vec.py."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_bits))

    @F.pandas_udf("int")
    def sketch(emb: pd.Series) -> pd.Series:
        m = np.vstack(emb.to_numpy())  # (batch, dim)
        bits = (m @ planes) > 0        # (batch, n_bits)
        vals = (bits * (1 << np.arange(n_bits))).sum(axis=1)
        return pd.Series(vals.astype(np.int32))

    s = df.withColumn("bucket", sketch("embedding"))
    # the bucket join carries ONLY (vec_id, bucket) — candidates are
    # deduped as narrow id pairs and the wide embedding arrays re-attach
    # AFTERWARDS via two slim equi-joins (same pattern as the minhash
    # verify path): at scale the arrays must not ride the candidate
    # shuffle, whose fan-out is quadratic in bucket occupancy
    ids = s.select("vec_id", "bucket")
    cand = (
        ids.select(F.col("vec_id").alias("vec_a"), "bucket")
        .join(ids.select(F.col("vec_id").alias("vec_b"), "bucket"), ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .dropDuplicates(["vec_a", "vec_b"])
    )
    emb = df.withColumn("nv", F.sqrt(F.expr(_NORM2.format(a="embedding"))))
    ea = emb.select(F.col("vec_id").alias("vec_a"),
                    F.col("embedding").alias("ea"), F.col("nv").alias("na"))
    eb = emb.select(F.col("vec_id").alias("vec_b"),
                    F.col("embedding").alias("eb"), F.col("nv").alias("nb"))
    pairs = cand.join(ea, "vec_a").join(eb, "vec_b")
    cos = F.round(
        F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb")), 6,
    )
    return pairs.select("vec_a", "vec_b", cos.alias("cosine")).filter(
        F.col("cosine") >= min_cosine
    )


@q(
    "ann_lsh_bucketed",
    oracle="""
    SELECT vec_id AS vec_a,
           CAST(vec_id + 1000000 AS BIGINT) AS vec_b,
           CAST(1.0 AS DOUBLE) AS cosine
    FROM embeddings WHERE vec_id < 100
    """,
)
def ann_lsh_bucketed(spark, sf):
    """LSH near-dup sweep over the corpus with planted duplicates
    (vec_id+1e6 copies, same convention as vec_cosine_neardup), projected
    to the PLANTED pairs so the driver hash-verifies 100% planted-pair
    recall: an identical vector has an identical sign sketch, so every
    planted pair must collide in its bucket, survive exact verification,
    and emit cosine exactly 1.0 (dot(a,a) and |a|² are the same
    left-to-right double reduction, so the quotient rounds to 1.0 at
    6 dp).  The hyperplane seed never reaches the output — the check is
    engine-portable where the raw pair dump (rows-only until round 2)
    was not.  Catalyst pushes the planted-id predicate into the bucket
    join; the UNPRUNED full-corpus sweep (precision=1.0 by construction,
    recall gate on near-dups) is exercised by tests/test_vec.py."""
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    dupe = e.unionByName(
        e.filter(F.col("vec_id") < 100).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    return lsh_pairs(dupe).filter(
        (F.col("vec_a") < 100) & (F.col("vec_b") == F.col("vec_a") + 1_000_000)
    )


_IVF_K = 16       # coarse centroids (production: k-means fit offline)
_IVF_NPROBE = 2   # clusters searched per query
_IVF_TOPK = 5


@q(
    "ann_ivf_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings
      WHERE vec_id < {_IVF_K}
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 {_DOT_SQL.format(a='e.embedding', b='c.ce')}
                 / SQRT({_NORM2_SQL.format(a='c.ce')}) DESC, c.cid) AS rn
        FROM embeddings e, cents c)
      WHERE rn = 1
    ),
    probes AS (
      SELECT vec_id AS probe_id, embedding AS pe, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                 {_DOT_SQL.format(a='e.embedding', b='c.ce')}
                 / SQRT({_NORM2_SQL.format(a='c.ce')}) DESC, c.cid) AS rn
        FROM embeddings e, cents c WHERE e.vec_id % 100 = 7)
      WHERE rn <= {_IVF_NPROBE}
    ),
    scored AS (
      SELECT p.probe_id, a.vec_id AS neighbor_id,
             ROUND({_DOT_SQL.format(a='p.pe', b='a.embedding')}
                   / (SQRT({_NORM2_SQL.format(a='p.pe')})
                      * SQRT({_NORM2_SQL.format(a='a.embedding')})), 6) AS cosine
      FROM probes p JOIN assign a ON a.cid = p.cid
      WHERE a.vec_id <> p.probe_id
    )
    SELECT probe_id, neighbor_id, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored) WHERE rn <= {_IVF_TOPK}
    """,
)
def ann_ivf_topk(spark, sf):
    """IVF (inverted-file) ANN — the bucket-pruned scale path with an
    exact SQL oracle: assign every vector to its nearest of K coarse
    centroids (one broadcast join — at 100 TB the only full pass), then
    each query probes its NPROBE nearest clusters and scores exact
    cosine ONLY within them (candidate set ~ NPROBE/K of the corpus vs
    brute force's all-pairs).  Centroids here are the first K embeddings
    — deterministic so DuckDB reproduces them; production fits them
    offline with k-means, which changes recall, not this plan shape.
    Recall on data with real cluster structure is gated in
    tests/test_vec.py (random gaussians have none by construction)."""
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    return ivf_topk(e, e.filter(F.col("vec_id") % 100 == 7))


def _centroid_affinity():
    """Centroid affinity: dot / |centroid| (query norm is rank-invariant)."""
    return (F.expr(_DOT.format(a="embedding", b="ce"))
            / F.sqrt(F.expr(_NORM2.format(a="ce"))))


def ivf_assign(e, cents):
    """Nearest-centroid assignment: broadcast join + ``max_by`` argmax.

    The n×K affinity rows reduce MAP-SIDE (partial aggregation) to one
    row per vector before the exchange — vs the window formulation,
    which shuffled all n×K rows and ran a per-vector sort.  Tie-break
    matches the oracle's (affinity DESC, cid ASC): maximizing
    struct(aff, -cid) is that exact lexicographic order."""
    aff = _centroid_affinity()
    return (
        e.join(cents)
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cid", F.struct(aff.alias("aff"), (-F.col("cid")).alias("nc"))
            ).alias("cid"),
            F.any_value("embedding").alias("embedding"),  # constant per group
        )
        .select("vec_id", "embedding", "cid")
    )


def ivf_topk(e, probes_src, k: int = _IVF_K, nprobe: int = _IVF_NPROBE,
             topk: int = _IVF_TOPK, cents=None):
    """The IVF pipeline over (vec_id, embedding) frames: max_by centroid
    assignment over a broadcast join (no Window in the corpus-scan
    subtree), cluster-pruned exact cosine scoring, per-probe top-k.
    ``cents`` defaults to the deterministic first-K stub (the oracle
    twin); pass ``fit_centroids_kmeans(...)`` for the production fit."""
    if cents is None:
        cents = e.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    cents = F.broadcast(cents)
    assign = ivf_assign(e, cents)
    # probes keep the window form: nprobe > 1 needs a per-vector top-N,
    # and the probe set is small by definition (the query side)
    aff = _centroid_affinity()
    w_assign = W.partitionBy("vec_id").orderBy(F.desc(aff), "cid")
    probes = (
        probes_src
        .join(cents)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= nprobe)
        .select(F.col("vec_id").alias("probe_id"),
                F.col("embedding").alias("pe"), "cid")
    )
    np_ = F.sqrt(F.expr(_NORM2.format(a="pe")))
    nv = F.sqrt(F.expr(_NORM2.format(a="embedding")))
    scored = (
        probes.withColumn("np_", np_)            # norm once per probe row
        .join(assign.withColumn("nv", nv), "cid")  # ... and per data vector
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.expr(_DOT.format(a="pe", b="embedding"))
                / (F.col("np_") * F.col("nv")),
                6,
            ).alias("cosine"),
        )
    )
    w_top = W.partitionBy("probe_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= topk)
        .select("probe_id", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF with FITTED centroids (production path; first-K stub = oracle twin)
# ---------------------------------------------------------------------------


def fit_centroids_kmeans(e, k: int = _IVF_K, iters: int = 10, seed: int = 7,
                         sample_cap: int = 2048):
    """Seeded k-means fit for IVF coarse centroids: a bounded
    deterministic sample (hash-ordered top-N — Spark plans
    TakeOrderedAndProject, a map-side top-k + driver merge, NOT a global
    sort) is collected and Lloyd-iterated driver-side with numpy, then
    returned as a (cid, ce) DataFrame to broadcast.  The collect is the
    FIT, not the scan — it is capped at ``sample_cap`` rows no matter
    the corpus size, the same shape as fitting offline and broadcasting
    the model.  k-means++ seeding + fixed iteration count keep the
    result a pure function of (data, seed)."""
    samp = (
        e.select("vec_id", "embedding")
        .orderBy(F.xxhash64(F.col("vec_id")), F.col("vec_id"))
        .limit(sample_cap)
    )
    rows = samp.collect()  # bounded: <= sample_cap rows (the model fit)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    # k-means++ init
    cents = [X[rng.randint(len(X))]]
    for _ in range(1, k):
        d2 = np.min(
            [((X - c) ** 2).sum(axis=1) for c in cents], axis=0)
        total = d2.sum()
        if total <= 0:  # degenerate: all points coincide with a centroid
            cents.append(X[rng.randint(len(X))])
            continue
        # clamp: float rounding can leave cumsum[-1] < rng.rand(), where
        # searchsorted would return len(X) and index out of bounds
        idx = int(np.searchsorted(np.cumsum(d2 / total), rng.rand()))
        cents.append(X[min(idx, len(X) - 1)])
    C = np.array(cents)
    for _ in range(iters):  # Lloyd
        a = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        for j in range(k):
            pts = X[a == j]
            if len(pts):
                C[j] = pts.mean(axis=0)
    spark = e.sparkSession
    return spark.createDataFrame(
        [(int(i), [float(v) for v in c]) for i, c in enumerate(C)],
        "cid bigint, ce array<double>",
    )


@q(
    "ann_ivf_kmeans",
    oracle="""
    SELECT CAST(vec_id + 1000000 AS BIGINT) AS probe_id,
           true AS found_original
    FROM embeddings WHERE vec_id < 50
    """,
)
def ann_ivf_kmeans(spark, sf):
    """IVF with FITTED (k-means) centroids, hash-verified via planted
    probes: each probe is an exact copy of a corpus vector under a
    shifted id.  An identical vector gets the identical centroid
    assignment (same affinities, same tie-break), so its nprobe set
    always contains the original's cluster and the original scores
    cosine 1.0 — the top of any candidate list.  found_original is
    therefore deterministically true for every probe REGARDLESS of
    where the fit places the centroids, which is exactly what makes a
    seeded-model query oracle-checkable.  Recall quality of the fit
    itself (vs the first-K stub) is gated on clustered fixtures in
    tests/test_vec.py."""
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    probes = e.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    cents = fit_centroids_kmeans(e)
    top = ivf_topk(e, probes, cents=cents)
    return (
        top.groupBy("probe_id")
        .agg(
            F.max(
                F.col("neighbor_id") == F.col("probe_id") - 1_000_000
            ).alias("found_original")
        )
    )


@q(
    "vec_quantize_int8",
    oracle="""
    WITH rng AS (
      SELECT vec_id, label, embedding,
             CAST(list_min(embedding) AS DOUBLE) AS mn,
             CAST(list_max(embedding) AS DOUBLE) AS mx
      FROM embeddings
    ),
    codes AS (
      SELECT vec_id, label, mn, mx,
             CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS scale,
             list_transform(embedding, x ->
               CASE WHEN mx > mn THEN
                 CAST(floor((CAST(x AS DOUBLE) - mn) / ((mx - mn) / 255.0)
                            + 0.5) AS BIGINT) - 128
               ELSE CAST(0 AS BIGINT) END) AS c,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
      FROM rng
    )
    SELECT vec_id, label,
           CAST(len(c) AS INT) AS dim,
           CAST(list_sum(c) AS BIGINT) AS code_sum,
           CAST(list_min(c) AS INT) AS code_min,
           CAST(list_max(c) AS INT) AS code_max,
           ROUND(mn, 6) AS vmin,
           ROUND(mx, 6) AS vmax,
           ROUND(list_sum(list_transform(generate_series(1, len(c)),
                 i -> (xs[i] - (mn + (c[i] + 128) * scale))
                      * (xs[i] - (mn + (c[i] + 128) * scale))))
                 / len(c), 12) AS mse
    FROM codes
    """,
)
def vec_quantize_int8(spark, sf):
    """Per-vector scalar int8 quantization — the standard 4x embedding
    compression an ANN serving layer applies before indexing: codes =
    round((x - min) / ((max - min)/255)) - 128 in [-128, 127], plus the
    reconstruction MSE so a pipeline can gate on quantization loss.

    Rounding uses floor(v + 0.5) explicitly in BOTH engines (never the
    engine's round(): Spark HALF_UP vs DuckDB's banker's-rounding
    disagree at exact .5 ties).  Everything is element-wise JVM HOF
    arithmetic on the embedding array — zero shuffle, zero Python, one
    narrow pass; at 100 TB this pipelines inside whole-stage codegen on
    the scan.  Output is scalar summaries (code checksum, min/max, MSE),
    not the code array itself — oracle-hashable and what a gate needs."""
    e = t(spark, sf, "embeddings")
    mn = "CAST(array_min(embedding) AS DOUBLE)"
    mx = "CAST(array_max(embedding) AS DOUBLE)"
    scale = f"CASE WHEN {mx} > {mn} THEN ({mx} - {mn}) / 255.0 ELSE 1.0 END"
    codes = (
        f"transform(embedding, x -> CASE WHEN {mx} > {mn} THEN "
        f"CAST(floor((CAST(x AS DOUBLE) - {mn}) / (({mx} - {mn}) / 255.0)"
        f" + 0.5) AS BIGINT) - 128 ELSE CAST(0 AS BIGINT) END)"
    )
    c = e.select(
        "vec_id", "label",
        F.expr(mn).alias("mn"), F.expr(mx).alias("mx"),
        F.expr(scale).alias("scale"),
        F.expr(codes).alias("c"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("xs"),
    )
    return c.select(
        "vec_id", "label",
        F.size("c").alias("dim"),
        F.expr(
            "aggregate(c, CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("code_sum"),
        F.expr("CAST(array_min(c) AS INT)").alias("code_min"),
        F.expr("CAST(array_max(c) AS INT)").alias("code_max"),
        F.round("mn", 6).alias("vmin"),
        F.round("mx", 6).alias("vmax"),
        F.round(
            F.expr(
                "aggregate(zip_with(xs, c, (x, v) ->"
                " (x - (mn + (v + 128) * scale)) * (x - (mn + (v + 128) * scale))),"
                " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / size(c)"
            ),
            12,
        ).alias("mse"),
    )


# SemDeDup semantic dedup: within-cluster cosine threshold.  τ sits far
# above the random-pair cosine range (64-dim gaussians concentrate near
# 0 ± ~0.125σ) and just below exact-copy cosine (1.0 up to summation
# rounding), so the boolean is robust to engine summation-order ulps.
_SEM_TAU = 0.99
_SEM_PLANT = 200  # planted exact copies (vec_id + 1e6) that must dedup


@q(
    "dedup_semantic",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings
      WHERE vec_id < {_IVF_K}
    ),
    corpus AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings
      WHERE vec_id < {_SEM_PLANT}
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT v.vec_id, v.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                 {_DOT_SQL.format(a='v.embedding', b='c.ce')}
                 / SQRT({_NORM2_SQL.format(a='c.ce')}) DESC, c.cid) AS rn
        FROM corpus v, cents c) WHERE rn = 1
    ),
    dups AS (
      SELECT DISTINCT b.vec_id AS vid
      FROM assign a JOIN assign b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
      WHERE {_DOT_SQL.format(a='a.embedding', b='b.embedding')}
            / (SQRT({_NORM2_SQL.format(a='a.embedding')})
               * SQRT({_NORM2_SQL.format(a='b.embedding')})) >= {_SEM_TAU}
    )
    SELECT s.vec_id, CAST(s.cid AS BIGINT) AS cid,
           (d.vid IS NULL) AS kept
    FROM assign s LEFT JOIN dups d ON s.vec_id = d.vid
    """,
)
def dedup_semantic(spark, sf):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): assign every embedding to a coarse cluster, then
    remove any member whose cosine to a SMALLER-id member of the same
    cluster is ≥ τ — the greedy keep-first policy, deterministic and
    partitioning-invariant because the order key is the id, not arrival.
    Exact copies are planted (vec_id + 1e6) so the dedup provably fires;
    the oracle recomputes assignment + within-cluster pairs in SQL.

    Shape (100 TB posture): the only full-corpus pass is the broadcast
    nearest-centroid assignment (``ivf_assign`` — max_by hash agg, no
    window); the pairwise stage is an equi-join ON cid, so candidate
    volume is Σ|cluster|² — the SemDeDup contract is that K scales with
    the corpus to keep clusters bounded (paper uses K≈50k for LAION),
    never an all-pairs join.  Norms are computed once per side before
    the pair join; centroids here are the deterministic first-K stub so
    DuckDB reproduces assignment exactly (production swaps in
    ``fit_centroids_kmeans`` — same plan, recall gated in tests)."""
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < _SEM_PLANT).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    corpus = e.unionByName(planted)
    cents = F.broadcast(
        e.filter(F.col("vec_id") < _IVF_K).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")))
    assign = ivf_assign(corpus, cents)  # (vec_id, embedding, cid)
    nrm = F.sqrt(F.expr(_NORM2.format(a="embedding")))
    a = assign.select(
        "cid", F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("ea"), nrm.alias("na"))
    b = assign.select(
        "cid", F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("eb"), nrm.alias("nb"))
    cos = (F.expr(_DOT.format(a="ea", b="eb"))
           / (F.col("na") * F.col("nb")))
    dups = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= _SEM_TAU)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return (
        assign.join(dups, "vec_id", "left")
        .select("vec_id", F.col("cid").cast("bigint").alias("cid"),
                F.col("dup").isNull().alias("kept"))
    )


_RRF_K = 60  # standard reciprocal-rank-fusion constant (Cormack et al. 2009)


@q(
    "vec_rrf_fusion",
    oracle=f"""
    WITH probes AS (
      SELECT vec_id AS probe_id, embedding AS pe,
             {_NORM2_SQL.format(a='embedding')} AS pn2
      FROM embeddings WHERE vec_id < 5
    ),
    cand AS (
      SELECT vec_id, embedding, {_NORM2_SQL.format(a='embedding')} AS n2
      FROM embeddings
    ),
    scored AS (
      SELECT probe_id, c.vec_id AS neighbor_id,
             CAST(ROUND({_DOT_SQL.format(a='pe', b='c.embedding')}
                   / (SQRT(pn2) * SQRT(n2)) * 1000000) AS BIGINT) AS cos_fp,
             CAST(ROUND((pn2 + n2
                   - 2 * {_DOT_SQL.format(a='pe', b='c.embedding')})
                   * 1000000) AS BIGINT) AS l2_fp
      FROM probes, cand c WHERE c.vec_id <> probe_id
    ),
    ranked AS (
      SELECT probe_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY cos_fp DESC, neighbor_id) AS r_cos,
             ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY l2_fp ASC, neighbor_id) AS r_l2
      FROM scored
    ),
    fused AS (
      SELECT probe_id, neighbor_id, r_cos, r_l2,
             1.0 / ({_RRF_K} + r_cos) + 1.0 / ({_RRF_K} + r_l2) AS rrf
      FROM ranked
    )
    SELECT probe_id, neighbor_id,
           CAST(r_cos AS BIGINT) AS r_cos, CAST(r_l2 AS BIGINT) AS r_l2,
           ROUND(rrf, 8) AS rrf
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                       ORDER BY rrf DESC, neighbor_id) AS rn
          FROM fused) WHERE rn <= 10
    """,
)
def vec_rrf_fusion(spark, sf):
    """Hybrid-retrieval rank fusion: two independent rankings of the
    same candidate set — cosine similarity and L2 distance — fused per
    probe with reciprocal-rank fusion, RRF(d) = Σ 1/(k + rank_i(d))
    (Cormack, Clarke & Büttcher, SIGIR 2009; the standard way hybrid
    search merges BM25 with ANN lists without score calibration).

    Cross-engine determinism: both metrics are ×1e6 fixed-point BIGINTs
    before ranking (identical left-to-right double reductions on both
    sides, so the rounded ints agree), ranks are integers with a
    neighbor_id tie-break, and the RRF score is a sum of two rationals
    of small ints — bit-identical doubles in both engines.

    Shape (100 TB posture): the probe set broadcasts (query side is
    small by definition), each metric is one JVM HOF expression over the
    SAME scan (Catalyst collapses both into one projection — the dot
    product is computed once and reused), and the per-probe rank windows
    partition on probe_id, so parallelism scales with the query batch.
    At corpus scale the candidate generator upstream is the IVF/LSH
    pruned path (ann_ivf_topk / ann_lsh_bucketed); brute-force candidates
    here keep the oracle exact."""
    e = t(spark, sf, "embeddings").select(
        "vec_id", "embedding",
        F.expr(_NORM2.format(a="embedding")).alias("n2"),
    )
    probes = F.broadcast(
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe"),
            F.col("n2").alias("pn2"),
        )
    )
    dot = F.expr(_DOT.format(a="pe", b="embedding"))
    scored = (
        probes.join(e, F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot / (F.sqrt("pn2") * F.sqrt("n2")) * 1e6)
            .cast("long").alias("cos_fp"),
            F.round((F.col("pn2") + F.col("n2") - 2 * dot) * 1e6)
            .cast("long").alias("l2_fp"),
        )
    )
    w_cos = W.partitionBy("probe_id").orderBy(F.desc("cos_fp"), "neighbor_id")
    w_l2 = W.partitionBy("probe_id").orderBy(F.asc("l2_fp"), "neighbor_id")
    ranked = scored.select(
        "probe_id", "neighbor_id",
        F.row_number().over(w_cos).alias("r_cos"),
        F.row_number().over(w_l2).alias("r_l2"),
    )
    rrf = (
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_cos"))
        + F.lit(1.0) / (F.lit(_RRF_K) + F.col("r_l2"))
    )
    fused = ranked.withColumn("rrf", rrf)
    w_top = W.partitionBy("probe_id").orderBy(F.desc("rrf"), "neighbor_id")
    return (
        fused.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= 10)
        .select("probe_id", "neighbor_id",
                F.col("r_cos").cast("bigint").alias("r_cos"),
                F.col("r_l2").cast("bigint").alias("r_l2"),
                F.round("rrf", 8).alias("rrf"))
    )


@q(
    "vec_knn_graph",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings
      WHERE vec_id < {_IVF_K}
    ),
    assign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT v.vec_id, v.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                 {_DOT_SQL.format(a='v.embedding', b='c.ce')}
                 / SQRT({_NORM2_SQL.format(a='c.ce')}) DESC, c.cid) AS rn
        FROM embeddings v, cents c) WHERE rn = 1
    ),
    scored AS (
      SELECT a.vec_id AS src, b.vec_id AS dst,
             ROUND({_DOT_SQL.format(a='a.embedding', b='b.embedding')}
                   / (SQRT({_NORM2_SQL.format(a='a.embedding')})
                      * SQRT({_NORM2_SQL.format(a='b.embedding')})), 6)
               AS cosine
      FROM assign a JOIN assign b
        ON a.cid = b.cid AND a.vec_id <> b.vec_id
    )
    SELECT src, dst, cosine FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY src
                                   ORDER BY cosine DESC, dst) AS rn
      FROM scored) WHERE rn <= 3
    """,
)
def vec_knn_graph(spark, sf):
    """Cluster-local k-NN graph (k=3): each vector's nearest neighbors
    WITHIN its coarse IVF cluster — the construction step behind
    graph-based ANN indexes (HNSW/NSG seeds), label propagation over
    embeddings, and graph-regularized dedup.  Candidates come from the
    nearest-centroid assignment (same deterministic first-K centroids
    as dedup_semantic so DuckDB reproduces the partition exactly);
    ranking is on the 6-dp-rounded cosine with a dst-id tie-break in
    BOTH engines, so the emitted edge set is hash-identical.

    Shape (100 TB posture): one broadcast centroid-assignment pass
    (max_by hash agg, no window over the corpus), then an equi-join ON
    cid bounds pair volume to Σ|cluster|² (the SemDeDup contract: K
    grows with the corpus) — never all-pairs; norms computed once per
    side; the per-src top-3 window runs over cluster-local candidates
    only.  Production recall knob = multi-probe assignment (append
    2nd-nearest centroid), same plan shape."""
    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    cents = F.broadcast(
        e.filter(F.col("vec_id") < _IVF_K).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")))
    assign = ivf_assign(e, cents)
    nrm = F.sqrt(F.expr(_NORM2.format(a="embedding")))
    a = assign.select(F.col("vec_id").alias("src"),
                      F.col("embedding").alias("ea"), nrm.alias("na"), "cid")
    b = assign.select(F.col("vec_id").alias("dst"),
                      F.col("embedding").alias("eb"), nrm.alias("nb"), "cid")
    cos = F.round(
        F.expr(_DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb")), 6)
    scored = (
        a.join(b, "cid")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", cos.alias("cosine"))
    )
    from pyspark.sql import Window as W
    w = W.partitionBy("src").orderBy(F.desc("cosine"), "dst")
    return (
        scored.select("src", "dst", "cosine",
                      F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .select("src", "dst", "cosine")
    )
