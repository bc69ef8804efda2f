"""Semantic gates for the training-data curation operators (the DuckDB
oracle proves cross-engine equality; these pin the properties a pipeline
actually relies on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.plans import registry

registry.load_all()


def test_sample_is_partitioning_invariant(spark, sf_dir):
    # hash sampling must select the same documents no matter how the
    # input was partitioned (a seeded df.sample() would not)
    ids = {
        r["doc_id"]
        for r in registry.QUERIES["sample_deterministic"](spark, sf_dir).collect()
    }
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(17)
    h4 = "CAST(conv(substring(md5(cast(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)"
    ids2 = {r["doc_id"]
            for r in d.filter(F.expr(h4) % 10 == 3).select("doc_id").collect()}
    assert ids == ids2 and ids, "hash sample depends on partitioning"


def test_split_is_complementary_and_exhaustive(spark, sf_dir):
    s = registry.QUERIES["split_train_holdout"](spark, sf_dir)
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    counts = {r["split"]: r["n"]
              for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts.get("train", 0) + counts.get("holdout", 0) == total
    assert counts.get("holdout", 0) > 0, "empty holdout"
    assert s.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_cap_per_source_holds(spark, sf_dir):
    s = registry.QUERIES["sample_cap_per_source"](spark, sf_dir)
    over = s.groupBy("source").count().filter(F.col("count") > 50).count()
    assert over == 0, "a source exceeded its cap"


def test_pack_bins_respect_budget(spark, sf_dir):
    """First-fit-by-cumsum guarantee: a bin's token total never exceeds
    budget + (tokens of its last doc) — i.e. only the straddling doc can
    overflow, and (except for oversized single docs) every bin but the
    last is filled past nothing less than its start boundary."""
    p = registry.QUERIES["pack_token_budget"](spark, sf_dir)
    stats = (p.groupBy("bin_id")
             .agg(F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("mx"))
             .collect())
    assert stats
    for r in stats:
        assert r["tot"] <= 2048 + r["mx"], (
            f"bin {r['bin_id']} holds {r['tot']} tokens (max doc {r['mx']})")


def test_pii_scrub_redacts_planted_pii(spark, tmp_path):
    """The harness corpus has no PII, so the oracle check alone can't
    prove the regexes fire — plant real-looking emails/phones and assert
    they are redacted (and clean text untouched)."""
    import os

    d = spark.createDataFrame(
        [(1, "contact alice.smith+x@example-corp.io or call +1 (415) 555-0199 now"),
         (2, "no pii here, just words and a version 1.2.3 string")],
        "doc_id long, text string",
    )
    path = os.path.join(str(tmp_path), "documents.parquet")
    d.write.parquet(path)
    out = {r["doc_id"]: r for r in
           registry.QUERIES["text_pii_scrub"](spark, str(tmp_path)).collect()}
    assert "<EMAIL>" in out[1]["scrubbed"] and "<PHONE>" in out[1]["scrubbed"]
    assert "alice" not in out[1]["scrubbed"] and "555" not in out[1]["scrubbed"]
    assert out[1]["n_emails"] == 1
    assert out[2]["scrubbed"] == "no pii here, just words and a version 1.2.3 string"


def test_pii_scrub_email_count_matches_redactions(spark, tmp_path):
    """Regression: the email-count pattern must be the SAME regex as the
    scrub (an F.expr string literal silently unescaped '\\.' to any-char
    and counted non-emails the scrub left untouched)."""
    import os

    d = spark.createDataFrame(
        [(1, "ping me at bob@intranet please"),        # not an email (no TLD)
         (2, "real contact x@y.io here")],
        "doc_id long, text string",
    )
    d.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = {r["doc_id"]: r for r in
           registry.QUERIES["text_pii_scrub"](spark, str(tmp_path)).collect()}
    assert out[1]["n_emails"] == 0 and "<EMAIL>" not in out[1]["scrubbed"]
    assert out[2]["n_emails"] == 1 and "<EMAIL>" in out[2]["scrubbed"]


def test_repetition_score_formula_on_planted_docs(spark, tmp_path):
    """Pin the dup-word-fraction math on docs with KNOWN repetition —
    the oracle check alone can't catch an inverted formula if both
    engines invert it identically."""
    import os

    d = spark.createDataFrame(
        [(1, "a a a a"),             # 4 words, 1 distinct → 0.75
         (2, "w x y z"),             # all distinct → 0.0
         (3, "a b a b a b")],        # 6 words, 2 distinct → 0.6667
        "doc_id long, text string",
    )
    d.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = {r["doc_id"]: r["dup_word_frac"] for r in
           registry.QUERIES["text_repetition_score"](
               spark, str(tmp_path)).collect()}
    assert out == {1: 0.75, 2: 0.0, 3: 0.6667}, out


def test_repetition_score_nonvacuous_on_corpus(spark, sf_dir):
    df = registry.QUERIES["text_repetition_score"](spark, sf_dir)
    rows = df.count()
    nonzero = df.filter(F.col("dup_word_frac") > 0).count()
    assert rows > 0 and nonzero > 0, "repetition score vacuous on corpus"


def test_decontaminate_flags_planted_overlap(spark, sf_dir):
    """Every doc flagged shares a real 8-gram with the bench set; and a
    corpus doc that IS a benchmark doc's text twin would always be
    flagged — approximate by checking flagged docs exist whenever any
    corpus doc textually equals a bench doc's prefix overlap (sanity:
    non-empty result on the harness corpus implies join works)."""
    out = registry.QUERIES["decontaminate_vs_holdout"](spark, sf_dir)
    rows = out.collect()
    for r in rows:
        assert r["n_hits"] >= 1
    # flagged docs must come from the corpus side only
    flagged = {r["doc_id"] for r in rows}
    assert all(i % 50 != 0 for i in flagged)


def test_multimodal_decode_raw_surface(spark):
    """The raw (pre-booleanization) decode surface: byte counts are the
    payload's true length, dims deterministic across two runs, codec
    tagged — the metadata the registered query reduces to booleans."""
    from ocr_spark.plans.queries_extract import decoded_metadata

    d = spark.createDataFrame(
        [(1, b"abc"), (2, b"x" * 1000)], "doc_id long, payload binary"
    )
    rows = {r["doc_id"]: r for r in decoded_metadata(d).collect()}
    again = {r["doc_id"]: r for r in decoded_metadata(d).collect()}
    assert rows == again, "fake decode is not deterministic"
    assert rows[1]["n_bytes"] == 3 and rows[2]["n_bytes"] == 1000
    for r in rows.values():
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 80
        assert r["codec"] == "fake/v1"


def test_multimodal_frame_raw_surface(spark):
    """Raw frame rows: exploding cardinality (>= 1 frame per doc), dense
    frame_idx, per-frame digests unique within a doc, timestamps
    non-decreasing — checked on the exploded rows themselves (the
    registered query aggregates these same invariants per doc)."""
    from ocr_spark.plans.queries_extract import sampled_frames

    d = spark.createDataFrame(
        [(i, f"payload {i}".encode()) for i in range(20)],
        "doc_id long, payload binary",
    )
    by_doc = {}
    for r in sampled_frames(d).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(20))
    for doc_id, frames in by_doc.items():
        frames.sort(key=lambda r: r["frame_idx"])
        assert 1 <= len(frames) <= 4
        assert [f["frame_idx"] for f in frames] == list(range(len(frames)))
        assert len({f["frame_sha"] for f in frames}) == len(frames)
        ts = [f["ts_ms"] for f in frames]
        assert ts == sorted(ts) and ts[0] >= 0 and ts[-1] < 60000


def test_dedup_paragraphs_removes_shared_boilerplate(spark, tmp_path):
    """Plant a shared 25-word boilerplate paragraph across three docs:
    exactly one copy survives (in the doc that wins the deterministic
    (hash, doc_id, idx) order), unique prose is untouched, and restitch
    preserves each doc's original paragraph order."""
    import os

    boiler = " ".join(f"b{i}" for i in range(25))
    uniq = {k: " ".join(f"u{k}w{i}" for i in range(25)) for k in (1, 2, 3)}
    d = spark.createDataFrame(
        [(1, boiler + " " + uniq[1]),
         (2, boiler + " " + uniq[2]),
         (3, uniq[3] + " " + boiler)],
        "doc_id long, text string",
    )
    d.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    out = {r["doc_id"]: r for r in
           registry.QUERIES["dedup_paragraphs"](spark, str(tmp_path)).collect()}
    assert {k: r["n_paras"] for k, r in out.items()} == {1: 2, 2: 2, 3: 2}
    survivors = [k for k, r in out.items() if boiler in r["text_dedup"]]
    assert len(survivors) == 1, survivors
    for k in (1, 2, 3):
        assert uniq[k] in out[k]["text_dedup"], k
        assert out[k]["n_kept"] == (2 if k in survivors else 1)
    # restitch order: the winner keeps its ORIGINAL order
    w = survivors[0]
    want = (uniq[3] + " " + boiler) if w == 3 else (boiler + " " + uniq[w])
    assert out[w]["text_dedup"] == want


def test_dedup_paragraphs_nonvacuous_on_corpus(spark, sf_dir):
    out = registry.QUERIES["dedup_paragraphs"](spark, sf_dir)
    agg = out.agg(F.sum("n_paras").alias("t"), F.sum("n_kept").alias("k")).collect()[0]
    assert agg["t"] > agg["k"], "corpus has no duplicate paragraphs - vacuous"


def test_length_filter_band_is_exact_quantiles(spark, sf_dir):
    import duckdb

    out = registry.QUERIES["filter_length_outliers"](spark, sf_dir)
    row = out.select("lo", "hi").distinct().collect()
    assert len(row) == 1
    lo, hi = row[0]["lo"], row[0]["hi"]
    want = duckdb.sql(
        f"SELECT quantile_disc(n_chars, 0.05), quantile_disc(n_chars, 0.95) "
        f"FROM '{sf_dir}/documents.parquet'").fetchall()[0]
    assert (lo, hi) == want
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    kept = out.count()
    assert 0 < kept < n_docs, "band kept everything (or nothing) - vacuous"
