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


def test_image_header_codecs_round_trip():
    """Real container synthesis → real header parse must round-trip the
    dims for every codec, including non-square and extreme-but-legal
    sizes."""
    from ocr_spark.functions.imagex import (
        make_gif, make_jpeg, make_png, parse_image_meta)

    for w, h in ((1, 1), (16, 79), (640, 480), (65535, 2)):
        assert parse_image_meta(make_png(w, h)) == ("png", w, h)
        if w <= 65535 and h <= 65535:  # GIF/JPEG carry u16 dims
            assert parse_image_meta(make_gif(w, h)) == ("gif", w, h)
            assert parse_image_meta(make_jpeg(w, h)) == ("jpeg", w, h)


def test_synthesized_png_is_spec_valid():
    """The PNG is a COMPLETE file: signature, IHDR, a zlib IDAT that
    decompresses to exactly h filtered scanlines, correct chunk CRCs."""
    import struct
    import zlib

    from ocr_spark.functions.imagex import make_png

    b = make_png(13, 7, gray=42)
    assert b[:8] == b"\x89PNG\r\n\x1a\n" and b.endswith(
        b"IEND" + struct.pack(">I", zlib.crc32(b"IEND")))
    # walk chunks, verify every CRC
    i, idat = 8, b""
    while i < len(b):
        (ln,) = struct.unpack(">I", b[i:i + 4])
        tag, payload = b[i + 4:i + 8], b[i + 8:i + 8 + ln]
        (crc,) = struct.unpack(">I", b[i + 8 + ln:i + 12 + ln])
        assert crc == zlib.crc32(tag + payload), tag
        if tag == b"IDAT":
            idat += payload
        i += 12 + ln
    raw = zlib.decompress(idat)
    assert len(raw) == 7 * (1 + 13)  # h rows of (filter byte + w pixels)
    assert raw[1] == 42  # the gray level actually landed in the pixels


def test_image_header_parse_never_crashes_on_garbage():
    """Corrupt web payloads are the common case: random bytes, truncated
    headers, and hostile length fields must yield None, never raise."""
    import random

    from ocr_spark.functions.imagex import (
        make_gif, make_jpeg, make_png, parse_image_meta)

    rng = random.Random(7)
    samples = [bytes(rng.randrange(256) for _ in range(n))
               for n in (0, 1, 7, 64, 512)]
    for whole in (make_png(20, 30), make_gif(20, 30), make_jpeg(20, 30)):
        samples += [whole[:k] for k in (2, 6, 9, 15)]  # truncations
    samples += [b"\xff\xd8\xff\xc0\x00\x01",   # SOF with hostile length
                b"\x89PNG\r\n\x1a\nXXXXIHDR",  # PNG sig, mangled IHDR
                b"GIF89a\x00\x00\x00\x00\x00"]  # zero-dim GIF
    for s in samples:
        got = parse_image_meta(s)
        assert got is None or (got[1] > 0 and got[2] > 0)


def test_multimodal_decode_real_parses_from_bytes(spark, sf_dir):
    """The driver-facing query must get its dims from the PAYLOAD (real
    header parse), not from re-deriving the modular formula."""
    from ocr_spark.plans.queries_extract import real_image_metadata
    from ocr_spark.functions.imagex import make_png

    rows = [(i, make_png(100 + i, 200 + i)) for i in range(5)]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: (r["codec"], r["width"], r["height"])
           for r in real_image_metadata(d).collect()}
    assert got == {i: ("png", 100 + i, 200 + i) for i in range(5)}
    # and garbage payloads degrade, never fail the task
    g = spark.createDataFrame(
        [(9, b"not an image")], "doc_id long, payload binary")
    assert real_image_metadata(g).collect()[0]["codec"] == "unknown"


def test_wav_header_codec_round_trip():
    """RIFF synthesis → chunk-walk parse must round-trip channels /
    sample rate / sample count, including odd-payload pad bytes and
    multi-channel block alignment."""
    from ocr_spark.functions.audiox import make_wav, parse_wav_meta

    for ch, sr, ns in ((1, 8000, 0), (1, 8000, 33), (2, 44100, 1021),
                       (2, 16000, 64), (6, 48000, 7)):
        assert parse_wav_meta(make_wav(ch, sr, ns)) == ("pcm", ch, sr, ns)


def test_wav_parse_rejects_corrupt_never_raises():
    """Truncations, wrong magic, non-PCM tags, and zero block-align
    must all return None (the query maps that to codec='unknown'),
    never raise."""
    import struct

    from ocr_spark.functions.audiox import make_wav, parse_wav_meta

    good = make_wav(2, 16000, 100)
    for i in range(0, len(good), 7):  # every truncation prefix class
        parse_wav_meta(good[:i])  # must not raise
    assert parse_wav_meta(b"") is None
    assert parse_wav_meta(b"RIFFxxxxWAVE") is None       # no chunks
    assert parse_wav_meta(b"OggS" + good[4:]) is None    # wrong magic
    fi = good.find(b"fmt ") + 8
    non_pcm = good[:fi] + struct.pack("<H", 85) + good[fi + 2:]
    assert parse_wav_meta(non_pcm) is None               # MP3 tag
    zero_ba = good[:fi + 12] + struct.pack("<H", 0) + good[fi + 14:]
    assert parse_wav_meta(zero_ba) is None               # div-by-zero guard


def test_wav_round_trip_property():
    """Round-trip across the parameter lattice (hypothesis-style
    exhaustive sweep — the space is small enough to enumerate) plus
    parse-never-raises on byte mutations of a valid file."""
    from ocr_spark.functions.audiox import make_wav, parse_wav_meta

    for ch in (1, 2, 4, 8):
        for sr in (8000, 22050, 44100, 48000):
            for ns in (0, 1, 255, 2048):
                assert parse_wav_meta(make_wav(ch, sr, ns)) == \
                    ("pcm", ch, sr, ns)
    base = make_wav(2, 44100, 64)
    for i in range(0, len(base), 3):  # single-byte corruption sweep
        mutated = base[:i] + bytes([base[i] ^ 0xFF]) + base[i + 1:]
        parse_wav_meta(mutated)  # any result is fine; raising is not


def test_containment_planted_twins_all_detected(spark, sf_dir):
    """Semantic recall gate (stronger than oracle parity, which only
    proves both engines agree): every planted 3/5-prefix twin with a
    non-trivial gram set must be detected with containment ≥ 0.9
    against its original — the operator's reason to exist."""
    from pyspark.sql import functions as F

    from ocr_spark.plans import registry
    from ocr_spark.plans.queries_text import DUP_SHIFT

    registry.load_all()
    out = registry.QUERIES["dedup_containment"](spark, sf_dir)
    hits = {
        (r.doc_a, r.doc_b)
        for r in out.select("doc_a", "doc_b").collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # originals whose 3/5-prefix still carries >= 3 distinct 3-grams
    # AND whose full text has at least 5 words (so prefix != full)
    ws = F.split(F.trim("text"), " ")
    eligible = [
        r.doc_id for r in docs.select(
            "doc_id", F.size(ws).alias("nw")).filter("nw >= 10").collect()
    ]
    assert eligible, "corpus too small for the planted-twin gate"
    missed = [
        i for i in eligible
        if (i, i + DUP_SHIFT) not in hits and (i + DUP_SHIFT, i) not in hits
    ]
    # the prefix twin's grams are a subset of the original's, so
    # containment is exactly 1.0 — zero misses allowed
    assert not missed, f"planted twins not detected: {missed[:10]}"


def test_containment_prefix_filter_bounds_and_recall(spark, sf_dir):
    """The rarest-gram prefix filter must (a) generate NO MORE
    candidate pairs than the full inverted index (it is a subset by
    construction — this pins the fan-out saving that makes it the
    100 TB candidate generator) and (b) lose NOTHING: scoring the
    FULL-index candidates yields exactly the same containment ≥ 0.9
    pairs (the recall-completeness the pigeonhole argument promises)."""
    from pyspark.sql import functions as F

    from ocr_spark.plans.queries_text import (
        _CONT_TAU, DUP_SHIFT, _grams_of,
        containment_prefix_candidates)

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source")
    ws = F.split(F.trim("text"), " ")
    twin = d.select(
        (F.col("doc_id") + DUP_SHIFT).alias("doc_id"),
        F.array_join(
            F.slice(ws, 1, F.greatest((F.size(ws) * 3).cast("int") / F.lit(5),
                                      F.lit(3)).cast("int")),
            " ").alias("text"),
        "source")
    g = _grams_of(d.unionByName(twin))
    ex = g.select("doc_id", F.explode("gset").alias("g"))
    full = (
        ex.select(F.col("doc_id").alias("pa"), "g")
        .join(ex.select(F.col("doc_id").alias("pb"), "g"), "g")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("doc_a"), F.col("pb").alias("doc_b"))
        .distinct()
    )
    pfx = containment_prefix_candidates(g, _CONT_TAU)
    n_full, n_pfx = full.count(), pfx.count()
    assert 0 < n_pfx <= n_full, (n_pfx, n_full)

    def score(cand):
        ga = g.select(F.col("doc_id").alias("doc_a"),
                      F.col("gset").alias("gs_a"))
        gb = g.select(F.col("doc_id").alias("doc_b"),
                      F.col("gset").alias("gs_b"))
        mn = F.least(F.size("gs_a"), F.size("gs_b"))
        cont = F.size(F.array_intersect("gs_a", "gs_b")).cast("double") / mn
        return {
            (r.doc_a, r.doc_b)
            for r in cand.join(ga, "doc_a").join(gb, "doc_b")
            .filter((mn > 0) & (cont >= _CONT_TAU))
            .select("doc_a", "doc_b").collect()
        }

    assert score(pfx) == score(full), "prefix filter lost qualifying pairs"


def test_containment_prefix_exact_boundary_sz_multiple_of_10(spark):
    """Pigeonhole boundary regression: a smaller doc with sz = 10 grams
    sharing EXACTLY 9 (containment = 0.9 = tau) needs a 2-gram prefix
    (sz - ceil(tau*sz) + 1 = 2).  Floating (1-tau)*sz = 0.9999...8
    floors to 0 → a 1-gram prefix — and here the rarest gram of the
    small doc is deliberately its UNSHARED one, so the buggy length
    drops the qualifying pair.  The integer bound must find it."""
    from pyspark.sql import functions as F

    from ocr_spark.plans.queries_text import (
        _CONT_TAU, containment_prefix_candidates)

    # doc 1: grams 1..10 (gram 10 unshared, df=1 → sorts rarest-first)
    # doc 2: grams 1..9 shared (df=2) + 11 unique fillers (df=1)
    g = spark.createDataFrame(
        [(1, list(range(1, 11))),
         (2, list(range(1, 10)) + list(range(100, 111)))],
        "doc_id long, gset array<bigint>")
    cand = {(r.doc_a, r.doc_b)
            for r in containment_prefix_candidates(g, _CONT_TAU).collect()}
    assert (1, 2) in cand, (
        f"containment-0.9 pair missed at the sz%10==0 boundary: {cand}")


def test_cms_guarantees_hold_at_sf001(spark, sf_dir):
    """Both sketch guarantees over the FULL frame.  The probabilistic
    (e/w)·N error bound lives ONLY here — not in the driver oracle —
    so a legitimate rare exceedance fails with the key and margin
    named instead of as an opaque cross-engine hash mismatch
    (round-4 ADVICE)."""
    from ocr_spark.plans.queries_more import _cms_frame

    rows = _cms_frame(spark, sf_dir).collect()
    assert rows, "no event types"
    for r in rows:
        assert r.est_ge_exact, f"CMS underestimated {r.event_type}"
        assert r.err_within_bound, (
            f"CMS error bound violated for {r.event_type}: "
            f"est={r.est} exact={r.exact_n} over by {r.est - r.exact_n}")


def test_snapshot_diff_classifies_exactly(spark, sf_dir):
    """Semantic gate beyond engine parity: the diff classes must equal
    the perturbation construction — removed = %13 multiples, added =
    %17 multiples under shifted ids, changed = %11 multiples that
    survived deletion, and nothing else."""
    from pyspark.sql import functions as F

    from ocr_spark.plans import registry

    registry.load_all()
    out = registry.QUERIES["snapshot_diff"](spark, sf_dir)
    got = {(int(r.doc_id), r.change) for r in out.collect()}
    ids = [int(r.doc_id) for r in spark.read.parquet(
        f"{sf_dir}/documents.parquet").select("doc_id").collect()]
    expect = set()
    for i in ids:
        if i % 13 == 0:
            expect.add((i, "removed"))
        elif i % 11 == 0:
            expect.add((i, "changed"))
        if i % 17 == 0:
            expect.add((i + 9000000, "added"))
    assert got == expect


def test_equidepth_buckets_are_balanced(spark, sf_dir):
    """The defining property: every quantile bucket holds ~N/4 rows
    (within the slack integer-valued data forces at the boundaries)."""
    from ocr_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["agg_histogram_equidepth"](spark, sf_dir).collect()
    total = sum(r.n_rows for r in rows)
    assert len(rows) == 4
    for r in rows:
        assert r.n_rows >= total * 0.15, (
            f"bucket {r.bucket} too small: {r.n_rows}/{total}")


def test_sample_temperature_thins_planted_skew(spark, tmp_path):
    """Pin the α=0.5 rebalancing DIRECTION on a corpus with real skew.
    The harness corpus has exactly 25 docs in every source, so there the
    accept test degenerates to h < 65536 (always true) and the oracle
    parity would pass an inverted n_src/n_min transcription unchanged —
    this planted test recomputes the keep set independently in Python."""
    import hashlib
    import os

    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "rare") for i in range(25)]
    spark.createDataFrame(rows, "doc_id long, source string").write.parquet(
        os.path.join(str(tmp_path), "documents.parquet"))
    kept = {(r["doc_id"], r["source"]) for r in
            registry.QUERIES["sample_temperature"](
                spark, str(tmp_path)).collect()}

    def h4(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)

    n_src = {"big": 400, "rare": 25}
    expect = {(i, s) for i, s in rows
              if h4(i) * h4(i) * n_src[s] < 25 * 4294967296}
    assert kept == expect, "Spark keep set diverges from the formula"
    # the rarest source passes whole (keep-rate sqrt(25/25) = 1) ...
    assert sum(1 for _, s in kept if s == "rare") == 25
    # ... and the big one is thinned toward sqrt(25/400) = 25%, never
    # the inverse (an n_src/n_min swap keeps all 400)
    n_big = sum(1 for _, s in kept if s == "big")
    assert 60 <= n_big <= 140, n_big
