"""Recall properties of the rows-only dedup sketches (SimHash, MinHash-LSH).

The oracle harness (test_oracle_parity) covers every SQL-expressible
query; the seeded-sketch queries are rows-only by design, so their
correctness gate is a recall property instead: the duplicated corpus
(_dup_docs: every doc unioned with a doc_id-shifted exact copy) plants
one known exact-duplicate pair per document, and both sketches must
recover ALL of them — SimHash at hamming distance 0, MinHash-LSH via
identical signatures (τ=1.0 band collision is guaranteed for equal gram
sets, so banding cannot lose these pairs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.plans import registry
from ocr_spark.plans.queries_text import DUP_SHIFT, with_simhash

registry.load_all()


def _planted_ids(spark, sf_dir, min_tokens=0):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if min_tokens:
        d = d.filter(F.size(F.split(F.trim("text"), r"\s+")) >= min_tokens)
    return {int(r[0]) for r in d.select("doc_id").collect()}


def test_simhash_exact_dup_recall(spark, sf_dir):
    pairs = registry.QUERIES["dedup_simhash"](spark, sf_dir)
    ham0 = {
        (int(r["doc_a"]), int(r["doc_b"]))
        for r in pairs.filter(F.col("hamming") == 0).collect()
    }
    missing = {
        (i, i + DUP_SHIFT) for i in _planted_ids(spark, sf_dir)
    } - ham0
    assert not missing, f"SimHash missed {len(missing)} planted exact dups"


def test_simhash_near_dup_separation(spark):
    # one-word perturbation of a 40-word doc flips only the bits whose
    # majority vote was marginal (E[flips] ≈ 64·P(|margin|≤2) ≪ 32),
    # while unrelated docs sit near the random-hash expectation of 32 —
    # the sketch must separate the two regimes decisively
    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok7", "tokX")
    far = " ".join(f"other{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    sk = {r["doc_id"]: r["sh"] for r in with_simhash(df).collect()}
    ham = lambda a, b: bin((sk[a] ^ sk[b]) & (2**64 - 1)).count("1")
    assert ham(1, 2) <= 14, f"near-dup hamming {ham(1, 2)} too high"
    assert ham(1, 3) >= 20, f"unrelated docs too close: {ham(1, 3)}"
    assert ham(1, 2) < ham(1, 3), "no separation between near-dup and unrelated"


def test_minhash_lsh_exact_dup_recall(spark, sf_dir):
    pairs = registry.QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    got = {(int(r["doc_a"]), int(r["doc_b"])) for r in pairs.collect()}
    # gram sets only exist for docs with ≥ 3 tokens
    missing = {
        (i, i + DUP_SHIFT) for i in _planted_ids(spark, sf_dir, min_tokens=3)
    } - got
    assert not missing, f"MinHash-LSH missed {len(missing)} planted exact dups"


def test_simhash_is_pure_jvm_plan(spark, sf_dir):
    # the sketch must never fall back to a Python UDF stage
    plan = registry.QUERIES["dedup_simhash"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan, f"Python stage {marker} in simhash plan"


def test_connected_components_merges_multi_pair_clusters(spark, sf_dir):
    """The CC operator must do real propagation, not just echo pairs:
    (a) every planted (doc, doc+DUP_SHIFT) pair lands in one component,
    (b) at least one component merges MULTIPLE near-dup pairs (size > 2
    with a csize consistent across members), (c) component ids are the
    min doc_id of the member set (canonical, partitioning-invariant)."""
    rows = registry.QUERIES["dedup_connected_components"](
        spark, sf_dir).collect()
    comp = {int(r["doc_id"]): int(r["component"]) for r in rows}
    csize = {int(r["doc_id"]): int(r["csize"]) for r in rows}
    planted = _planted_ids(spark, sf_dir)
    assert all(comp[d] == comp[d + DUP_SHIFT] for d in planted)

    from collections import Counter
    sizes = Counter(comp.values())
    assert max(sizes.values()) > 2  # real multi-pair merge happened
    # csize column agrees with the actual component extents
    assert all(csize[d] == sizes[comp[d]] for d in comp)
    # canonical label = min member id
    members = {}
    for d, c in comp.items():
        members.setdefault(c, []).append(d)
    assert all(c == min(ms) for c, ms in members.items())


def test_connected_components_uses_reliable_checkpoint(spark):
    """Round-3 verdict task 4: propagation must persist rounds through
    RELIABLE checkpoint() (survives executor loss), not localCheckpoint
    (executor-local blocks, no recompute path once lineage is
    truncated).  Asserted by running a small CC and checking the
    session's checkpoint dir is set and physically populated."""
    import os
    from urllib.parse import urlparse

    from ocr_spark.plans.queries_text import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a int, doc_b int")
    nodes = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id int")
    got = {
        (r["doc_id"], r["comp"])
        for r in connected_components(edges, nodes).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (99, 99)}
    ckpt = spark.sparkContext.getCheckpointDir()
    assert ckpt, "no reliable checkpoint dir was set"
    path = urlparse(ckpt).path or ckpt
    files = [
        os.path.join(dp, f) for dp, _, fs in os.walk(path) for f in fs
    ]
    assert files, f"checkpoint dir {path} is empty — reliable "\
        "checkpoint() was never exercised"


def test_connected_components_raises_on_non_convergence(spark):
    """A diameter > max_iters graph must FAIL LOUDLY (round-3 advice),
    never silently emit one cluster under several component ids."""
    import pytest

    from ocr_spark.plans.queries_text import connected_components

    # a path graph 0-1-2-...-7 has diameter 7 > max_iters=2
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "doc_a int, doc_b int")
    nodes = spark.createDataFrame(
        [(i,) for i in range(8)], "doc_id int")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, nodes, max_iters=2).collect()


def test_minhash_recall_all_planted_pairs_found(spark, sf_dir):
    """The production-threshold (τ=0.8) LSH sweep must surface every
    qualifying planted near-dup (found=true for all rows) — the exact
    property the driver's booleanized oracle asserts."""
    df = registry.QUERIES["dedup_minhash_recall"](spark, sf_dir)
    rows = df.collect()
    assert rows, "no qualifying planted near-dup pairs at this SF"
    missed = [r for r in rows if not r["found"]]
    assert not missed, f"LSH missed {len(missed)} planted near-dups"
