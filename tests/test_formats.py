"""Table-format shim gates: the Iceberg production branch must at least
COMPILE (construct its read/write plans) even though the sandbox has no
Iceberg runtime jar, so the prod path can't silently rot; plus
open_table dispatch."""

from __future__ import annotations

import pytest

from ocr_spark.sources.formats import (
    IcebergTable,
    ParquetManifestTable,
    open_table,
)


def test_open_table_dispatch(tmp_path):
    t = open_table("iceberg:warehouse.db.spans")
    assert isinstance(t, IcebergTable)
    assert t.identifier == "warehouse.db.spans"
    p = open_table(str(tmp_path / "t"))
    assert isinstance(p, ParquetManifestTable)


def test_iceberg_write_plan_constructs(spark):
    """Dry-run the production write path up to (but not including)
    execution: DataFrameWriterV2 construction resolves the API surface
    (writeTo + options) with no catalog present."""
    df = spark.createDataFrame([("d1", [])],
                               "doc_id string, spans array<int>")
    w = IcebergTable("prod_cat.corpus.spans").write_plan(df)
    # the v2 writer exists and carries the append/overwrite verbs the
    # pipeline uses; executing would need the catalog, which this
    # sandbox lacks — execution raises, construction must not
    assert hasattr(w, "append") and hasattr(w, "overwritePartitions")


def test_iceberg_append_needs_catalog(spark):
    df = spark.createDataFrame([("d1",)], "doc_id string")
    with pytest.raises(Exception):
        IcebergTable("prod_cat.corpus.spans").write_plan(df).append()


# -- compaction / vacuum (small-files maintenance) ---------------------------

_SPAN_SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
                "media_ref:string,offset:int>>")


def _commit_wave(spark, tbl, run_id, lo, hi):
    """Write one micro-batch-style run covering doc ids [lo, hi) — the
    same write_wave → _wave_lineage → commit(append_runs=True) flow the
    streaming sink uses (streaming/jobs.py:138-155)."""
    from pyspark.sql import functions as F

    from ocr_spark.plans.pipeline import _wave_lineage
    from ocr_spark.sources.formats import lineage_exprs

    rows = [
        (f"d{i:04d}",
         [("text", f"body of doc {i}", None, 0),
          ("image", None, f"media://{i}", 1)])
        for i in range(lo, hi)
    ]
    df = (spark.createDataFrame(rows, _SPAN_SCHEMA)
          .withColumn("bucket",
                      F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int")))
    _, row_hash = lineage_exprs(df)
    out = df.withColumns({"doc_hash": row_hash,
                          "n_spans": F.size("spans")})
    wave_dir = tbl.write_wave(out, run_id)
    entries = _wave_lineage(spark, wave_dir, run_id, "2026-01-01T00:00:00Z")
    tbl.commit(entries, append_runs=True)
    return entries


def _table_key(spark, tbl):
    return sorted(
        (r["doc_id"], tuple(tuple(s) for s in r["spans"]))
        for r in tbl.read(spark).select("doc_id", "spans").collect()
    )


def test_compact_merges_runs_preserving_lineage(spark, tmp_path):
    """compact() rewrites N runs into one file set per bucket; the
    summed counts + xor-folded checksums must still pass the deep
    payload-rehash verify(), reads must be unchanged, and absorbed run
    ids must stay 'committed' for streaming idempotency."""
    import glob

    tbl = ParquetManifestTable(str(tmp_path / "t"))
    e1 = _commit_wave(spark, tbl, "batch000000001", 0, 40)
    e2 = _commit_wave(spark, tbl, "batch000000002", 40, 70)
    e3 = _commit_wave(spark, tbl, "batch000000003", 70, 90)
    before = _table_key(spark, tbl)
    n_entries = len(e1) + len(e2) + len(e3)
    assert len(tbl.lineage()) == n_entries  # multiple entries per bucket

    res = tbl.compact(spark, num_partitions=4)
    assert res["compacted_entries"] == n_entries
    assert res["buckets"] == 4

    # reads identical, one manifest entry per bucket, deep audit green
    assert _table_key(spark, tbl) == before
    lineage = tbl.lineage()
    assert len(lineage) == 4
    assert all(e["run_id"] == res["run_id"] for e in lineage)
    assert tbl.verify(spark) == []

    # absorbed micro-batches still look committed (retry stays a no-op),
    # and a zombie committer can't resurrect an absorbed run's entries
    runs = tbl.committed_runs()
    assert {"batch000000001", "batch000000002", "batch000000003",
            res["run_id"]} <= runs
    tbl.commit(e2, append_runs=True)
    assert len(tbl.lineage()) == 4

    # vacuum drops the absorbed run dirs (and any orphan half-written
    # run), keeps the compacted one; the table still reads + verifies
    orphan = tbl.run_dir("orphan_crash")
    import os
    os.makedirs(orphan, exist_ok=True)
    removed = tbl.vacuum()
    assert orphan in removed and len(removed) == 4
    live = glob.glob(str(tmp_path / "t" / "data" / "run=*"))
    assert [os.path.basename(d) for d in live] == [f"run={res['run_id']}"]
    assert _table_key(spark, tbl) == before
    assert tbl.verify(spark) == []


def test_compact_is_repeatable_and_append_continues(spark, tmp_path):
    """A compacted table keeps accepting new runs, and a SECOND
    compaction over (compacted + new) data works — regression for the
    discovered `run` partition column leaking into the data schema."""
    tbl = ParquetManifestTable(str(tmp_path / "t"))
    _commit_wave(spark, tbl, "batch000000001", 0, 30)
    r1 = tbl.compact(spark, num_partitions=2)
    _commit_wave(spark, tbl, "batch000000002", 30, 60)
    before = _table_key(spark, tbl)
    assert len(before) == 60

    r2 = tbl.compact(spark, num_partitions=2)
    assert r2["run_id"] != r1["run_id"]
    assert _table_key(spark, tbl) == before
    assert tbl.verify(spark) == []
    tbl.vacuum()
    assert _table_key(spark, tbl) == before


def test_compact_empty_table_is_noop(spark, tmp_path):
    tbl = ParquetManifestTable(str(tmp_path / "t"))
    assert tbl.compact(spark) == {"compacted_entries": 0, "run_id": None}


# -- snapshot history / time travel ------------------------------------------


def test_snapshot_time_travel(spark, tmp_path):
    """Every commit archives a manifest version; read(as_of=id) sees the
    table exactly as of that commit (Iceberg read-as-of)."""
    tbl = ParquetManifestTable(str(tmp_path / "t"))
    _commit_wave(spark, tbl, "batch000000001", 0, 30)
    after_w1 = _table_key(spark, tbl)
    s1 = tbl.snapshots()[-1]["snapshot_id"]
    _commit_wave(spark, tbl, "batch000000002", 30, 50)
    after_w2 = _table_key(spark, tbl)
    s2 = tbl.snapshots()[-1]["snapshot_id"]

    assert s2 > s1 and len(after_w1) == 30 and len(after_w2) == 50
    trav1 = sorted(
        (r["doc_id"], tuple(tuple(s) for s in r["spans"]))
        for r in tbl.read(spark, as_of=s1).select("doc_id", "spans").collect())
    assert trav1 == after_w1
    trav2 = sorted(
        (r["doc_id"], tuple(tuple(s) for s in r["spans"]))
        for r in tbl.read(spark, as_of=s2).select("doc_id", "spans").collect())
    assert trav2 == after_w2


def test_vacuum_expires_snapshots(spark, tmp_path):
    """Pre-compaction snapshots stay readable until vacuum() deletes the
    absorbed run files, then raise a clear expiry error — Iceberg's
    expire_snapshots contract."""
    import pytest

    tbl = ParquetManifestTable(str(tmp_path / "t"))
    _commit_wave(spark, tbl, "batch000000001", 0, 30)
    s1 = tbl.snapshots()[-1]["snapshot_id"]
    before = _table_key(spark, tbl)
    tbl.compact(spark, num_partitions=2)

    # between compact and vacuum: both current and as-of reads work
    assert _table_key(spark, tbl) == before
    assert tbl.read(spark, as_of=s1).count() == 30

    tbl.vacuum()
    ids = [s["snapshot_id"] for s in tbl.snapshots()]
    assert s1 not in ids and ids  # compacted snapshot survives
    with pytest.raises(FileNotFoundError, match="expired"):
        tbl.read(spark, as_of=s1)
    assert _table_key(spark, tbl) == before
    assert tbl.verify(spark) == []


def test_incremental_read_between_snapshots(spark, tmp_path):
    """read_incremental(since=s) returns exactly the rows committed
    after snapshot s — the Iceberg incremental-read pattern a polling
    consumer uses to process only new data."""
    import pytest

    tbl = ParquetManifestTable(str(tmp_path / "t"))
    _commit_wave(spark, tbl, "batch000000001", 0, 30)
    s1 = tbl.snapshots()[-1]["snapshot_id"]
    _commit_wave(spark, tbl, "batch000000002", 30, 50)
    inc = sorted(r["doc_id"] for r in
                 tbl.read_incremental(spark, since=s1).collect())
    assert inc == [f"d{i:04d}" for i in range(30, 50)]
    s2 = tbl.snapshots()[-1]["snapshot_id"]
    with pytest.raises(FileNotFoundError, match="no entries committed"):
        tbl.read_incremental(spark, since=s2)
