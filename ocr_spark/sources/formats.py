"""Table-format shim: Iceberg in production, Parquet+manifest in-sandbox.

Spec: BASELINE.json:6/:14 — read/write Iceberg tables with per-partition
lineage enabling idempotent restart.  The sandbox has no Iceberg runtime
jar and no network (SURVEY.md §0/§4.4), so the same pipeline code runs
against either of two implementations of one small interface:

  * ``IcebergTable``     — ``spark.read.format("iceberg")`` / ``writeTo``;
    selected when the Iceberg catalog is configured (production path).
  * ``ParquetManifestTable`` — a Parquet directory plus an atomically
    swapped JSON manifest that provides the snapshot semantics lineage
    needs: a (bucket, run) only exists for readers once its manifest
    entry is committed, so partially-written runs are invisible and
    restart is idempotent.

Manifest layout:
  <root>/data/run=<run_id>/bucket=<k>/part-*.parquet
  <root>/_manifest.json   {"entries": [{bucket, run_id, path,
                            doc_count, span_count, checksum, watermark}]}
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def lineage_exprs(df):
    """The ONE chunk-aware lineage convention, shared by the write path
    (plans/pipeline.py) and the read-side audit below: returns
    ``(is_doc_row, row_hash)`` expressions.

    A table may MIX doc-granular and chunk rows — a job can be restarted
    with a different ``chunk_max_spans`` and process only the buckets
    missing from the manifest — so the decision is PER ROW (null
    chunk_id = doc-granular row), never per table: ONLY null-chunk rows
    hash without the chunk term; every non-null chunk_id (including 0)
    includes it, so a doc's chunk-0 row and a doc-granular row for the
    same doc hash differently by design.  doc_count counts chunk_id==0
    rows (one per doc) plus null-chunk rows."""
    from pyspark.sql import functions as F

    if "chunk_id" not in df.columns:
        return F.lit(True), F.xxhash64("doc_id", "spans")
    is_doc = F.col("chunk_id").isNull() | (F.col("chunk_id") == 0)
    row_hash = F.when(
        F.col("chunk_id").isNull(), F.xxhash64("doc_id", "spans")
    ).otherwise(F.xxhash64("doc_id", "chunk_id", "spans"))
    return is_doc, row_hash


class ParquetManifestTable:
    def __init__(self, root: str) -> None:
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_path = os.path.join(root, "_manifest.json")

    # -- manifest ----------------------------------------------------------
    def _load(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"entries": []}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _store(self, m: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        # snapshot history (Iceberg snapshot-log semantics): every
        # committed manifest version is archived under _snapshots/<id>,
        # so read(as_of=<id>) can time-travel until vacuum() expires the
        # snapshot.  _store only runs under the writer lock, so the id
        # increment cannot race.
        m["snapshot_id"] = self._load().get("snapshot_id", 0) + 1
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".manifest.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f, indent=1)
        snap_dir = os.path.join(self.root, "_snapshots")
        os.makedirs(snap_dir, exist_ok=True)
        snap = os.path.join(snap_dir, f"{m['snapshot_id']:08d}.json")
        fd2, tmp2 = tempfile.mkstemp(dir=snap_dir, suffix=".snap.tmp")
        with os.fdopen(fd2, "w") as f:
            json.dump(m, f, indent=1)
        # archive first: a crash between the two renames leaves an orphan
        # snapshot file with an id the next commit recomputes and
        # overwrites — never a manifest pointing at a missing snapshot
        os.replace(tmp2, snap)
        os.replace(tmp, self.manifest_path)  # atomic swap = commit point

    def committed_buckets(self) -> set[int]:
        return {e["bucket"] for e in self._load()["entries"]}

    def lineage(self) -> list[dict]:
        """E9 lineage rows (partition id = salt bucket, doc/span counts,
        checksum, watermark, run_id) — BASELINE.json:6."""
        return list(self._load()["entries"])

    def run_dir(self, run_id: str) -> str:
        return os.path.join(self.data_dir, f"run={run_id}")

    def commit(self, entries: list[dict], append_runs: bool = False) -> None:
        """Append bucket entries idempotently.

        Batch mode (default): a bucket appears at most once in the
        manifest — a retried wave or a concurrent run cannot
        double-commit a bucket.  Streaming mode (``append_runs=True``):
        the idempotency key is (bucket, run) so one run per micro-batch
        can append new data for the same bucket, while a retried
        micro-batch (same run_id) stays a no-op."""
        # the load-modify-store below must be mutually exclusive or two
        # concurrent committers lose each other's entries (Iceberg gets
        # this from optimistic snapshot CAS; the parquet shim uses an
        # advisory file lock — same writer-side guarantee)
        import fcntl

        os.makedirs(self.root, exist_ok=True)
        with open(os.path.join(self.root, "_manifest.lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            m = self._load()
            if append_runs:
                have = {(e["bucket"], e["run_id"]) for e in m["entries"]}
                # a zombie committer (crashed between write and commit,
                # resumed after a compaction absorbed its run) must not
                # resurrect entries pointing at vacuumed directories
                gone = set(m.get("absorbed_runs", []))
                new = [e for e in entries
                       if (e["bucket"], e["run_id"]) not in have
                       and e["run_id"] not in gone]
            else:
                have = {e["bucket"] for e in m["entries"]}
                new = [e for e in entries if e["bucket"] not in have]
            m["entries"].extend(new)
            self._store(m)

    def snapshots(self) -> list[dict]:
        """Available snapshot versions, oldest first: one dict per
        archived manifest (id, entry count, run ids) — the Iceberg
        snapshot-log equivalent.  Snapshots expired by vacuum() are
        absent."""
        import glob as _glob

        out = []
        for p in sorted(_glob.glob(
                os.path.join(self.root, "_snapshots", "*.json"))):
            try:
                with open(p) as f:
                    m = json.load(f)
            except Exception:
                continue
            out.append({
                "snapshot_id": m.get("snapshot_id"),
                "n_entries": len(m["entries"]),
                "runs": sorted({e["run_id"] for e in m["entries"]}),
            })
        return out

    def _snapshot_entries(self, snapshot_id: int) -> list[dict]:
        p = os.path.join(self.root, "_snapshots", f"{snapshot_id:08d}.json")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"snapshot {snapshot_id} not found (expired by vacuum, or "
                f"never committed) in {self.root}")
        with open(p) as f:
            return json.load(f)["entries"]

    def committed_runs(self) -> set[str]:
        """Run ids with committed data, INCLUDING runs whose files were
        absorbed by a compaction — a retried streaming micro-batch whose
        run was compacted away must still see itself as committed."""
        m = self._load()
        return {e["run_id"] for e in m["entries"]} | set(
            m.get("absorbed_runs", []))

    # -- maintenance ---------------------------------------------------------
    def compact(self, spark: SparkSession,
                num_partitions: int | None = None) -> dict:
        """Rewrite all committed data into ONE run with one file set per
        bucket, then swap the manifest atomically — the small-files
        maintenance every long-lived wave/micro-batch table needs (the
        Iceberg path gets this from rewrite_data_files).

        Correctness properties (tests/test_formats.py):
        - snapshot-isolated: readers see either the old entries or the
          new ones, never a mix of old and new files for one bucket;
          entries committed by OTHER writers between our snapshot and
          the swap are preserved untouched;
        - lineage-preserving: the per-bucket doc/span counts are summed
          and the order-insensitive xor checksums FOLD (xor of the old
          entries' checksums == checksum of the merged rows), so the
          compacted entries still verify() against a full payload rehash
          without recomputing anything at compact time;
        - streaming-idempotent: absorbed run ids are recorded so a
          retried micro-batch stays a no-op after its files are gone;
        - crash-safe: a crash before the swap leaves the manifest (and
          readers) untouched; the orphan half-written run dir is removed
          by vacuum().
        """
        import fcntl
        import uuid

        from pyspark.sql import functions as F  # noqa: F401

        entries = self._load()["entries"]
        if not entries:
            return {"compacted_entries": 0, "run_id": None}
        run_id = f"compact{uuid.uuid4().hex[:12]}"
        df = spark.read.option("basePath", self.data_dir).option(
            "mergeSchema", "true").parquet(*[e["path"] for e in entries])
        n = num_partitions or spark.sparkContext.defaultParallelism
        out = self.run_dir(run_id)
        codec = os.environ.get("OCR_SPARK_CODEC", "zstd")
        # "run" is a DISCOVERED partition column (dir layout run=<id>) —
        # persisting it as a data column would collide with discovery on
        # the next read of the compacted files; "bucket" stays because
        # partitionBy consumes it back into the directory layout
        (df.drop("run")
         .repartition(n, "bucket")  # cluster: one file set per bucket
         .write.mode("append").option("compression", codec)
         .partitionBy("bucket").parquet(out))

        by_bucket: dict[int, dict] = {}
        for e in entries:
            b = by_bucket.setdefault(e["bucket"], {
                "doc_count": 0, "span_count": 0, "ck": 0,
                "watermark": e["watermark"]})
            b["doc_count"] += e["doc_count"]
            b["span_count"] += e["span_count"]
            b["ck"] ^= int(e["checksum"], 16)  # xor folds across runs
            b["watermark"] = max(b["watermark"], e["watermark"])
        new_entries = [
            {
                "bucket": k,
                "run_id": run_id,
                "path": f"{out}/bucket={k}",
                "doc_count": b["doc_count"],
                "span_count": b["span_count"],
                "checksum": format(b["ck"] & (2**64 - 1), "016x"),
                "watermark": b["watermark"],
            }
            for k, b in sorted(by_bucket.items())
        ]
        snap_keys = {(e["bucket"], e["run_id"]) for e in entries}
        with open(os.path.join(self.root, "_manifest.lock"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            m = self._load()
            # entries committed since our snapshot survive untouched
            keep = [e for e in m["entries"]
                    if (e["bucket"], e["run_id"]) not in snap_keys]
            absorbed = sorted(
                {e["run_id"] for e in entries}
                | set(m.get("absorbed_runs", [])))
            self._store({"entries": keep + new_entries,
                         "absorbed_runs": absorbed})
        return {"compacted_entries": len(entries),
                "buckets": len(new_entries), "run_id": run_id}

    def vacuum(self) -> list[str]:
        """Delete run directories no longer referenced by the manifest
        (post-compaction cleanup; also removes half-written runs left by
        a crash BEFORE their commit).  Must not race a live writer whose
        wave is written but not yet committed — run it from the
        maintenance job, not concurrently with ingestion (the Iceberg
        path gets retention semantics from expire_snapshots)."""
        import glob as _glob
        import shutil

        live = {os.path.normpath(e["path"]).rsplit("/bucket=", 1)[0]
                for e in self._load()["entries"]}
        removed = []
        for d in _glob.glob(os.path.join(self.data_dir, "run=*")):
            if os.path.normpath(d) not in live:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(d)
        # expire snapshots whose entries reference a removed run dir —
        # they can no longer be read as-of (Iceberg: expire_snapshots
        # precedes orphan-file deletion; here file deletion drives the
        # expiry, same end state)
        gone = {os.path.normpath(d) for d in removed}
        for p in _glob.glob(os.path.join(self.root, "_snapshots", "*.json")):
            try:
                with open(p) as f:
                    snap_entries = json.load(f)["entries"]
            except Exception:
                continue
            refs = {os.path.normpath(e["path"]).rsplit("/bucket=", 1)[0]
                    for e in snap_entries}
            if refs & gone:
                os.remove(p)
        return removed

    # -- I/O ----------------------------------------------------------------
    def write_wave(self, df: DataFrame, run_id: str) -> str:
        out = self.run_dir(run_id)
        # zstd: ~30-40% smaller than snappy on text-heavy spans at similar
        # encode speed — at 10^12-doc scale the sink's byte volume IS the
        # dominant I/O cost; override via OCR_SPARK_CODEC
        codec = os.environ.get("OCR_SPARK_CODEC", "zstd")
        (df.write.mode("append").option("compression", codec)
         .partitionBy("bucket").parquet(out))
        return out

    def read(self, spark: SparkSession,
             as_of: int | None = None) -> DataFrame:
        """Union of committed (bucket, run) paths only — uncommitted files
        are invisible (snapshot isolation).  ``as_of`` time-travels to an
        archived snapshot version (``snapshots()`` lists them); valid
        until vacuum() expires snapshots whose files a compaction
        absorbed — exactly Iceberg's read-as-of + expire_snapshots
        contract."""
        entries = (self._load()["entries"] if as_of is None
                   else self._snapshot_entries(as_of))
        if not entries:
            raise FileNotFoundError(f"no committed data in {self.root}")
        paths = [e["path"] for e in entries]
        return spark.read.option("basePath", self.data_dir).parquet(*paths)

    def read_incremental(self, spark: SparkSession,
                         since: int) -> DataFrame:
        """Rows committed AFTER snapshot ``since`` (Iceberg incremental
        read): the set difference of manifest entries keyed on
        (bucket, run), so a downstream consumer can process only new
        data per poll without replaying the table.  Compacted-away
        entries never re-appear as 'new': a compaction rewrites OLD rows
        under a new run id, so consumers should poll between
        maintenance windows or track doc-level watermarks on top."""
        have = {(e["bucket"], e["run_id"])
                for e in self._snapshot_entries(since)}
        new = [e for e in self._load()["entries"]
               if (e["bucket"], e["run_id"]) not in have]
        if not new:
            raise FileNotFoundError(
                f"no entries committed after snapshot {since} in {self.root}")
        return spark.read.option("basePath", self.data_dir).parquet(
            *[e["path"] for e in new])

    def verify(self, spark: SparkSession) -> list[dict]:
        """Integrity audit: RE-COMPUTE each committed (bucket, run)'s
        doc count / span count / order-insensitive checksum from the
        span payloads as read back off disk — re-hashing, not trusting
        the doc_hash/n_spans columns persisted at write time — and diff
        against the lineage rows.  Returns one dict per mismatching
        entry (empty list = table verifies).  This is the read-side
        counterpart of the E9 write-side lineage: because the hash is
        recomputed from the nested payloads, it catches corrupted or
        truncated span data, not just lost/duplicated rows.  (The cheap
        stored-column scan remains the per-wave lineage path in
        plans/pipeline.py — this full-payload audit is the deep check.)
        """
        from pyspark.sql import functions as F

        entries = self._load()["entries"]
        if not entries:
            return []
        # mergeSchema: a table can mix doc-granular and chunk runs, and
        # without merging, whether chunk_id is visible would depend on
        # which file Spark samples for the schema
        df = spark.read.option("basePath", self.data_dir).option(
            "mergeSchema", "true").parquet(*[e["path"] for e in entries])
        is_doc, row_hash = lineage_exprs(df)
        run_col = F.regexp_extract(F.input_file_name(), r"run=([^/]+)", 1)
        actual = {
            (int(r["bucket"]), r["run_id"]): r
            for r in df.withColumn("run_id", run_col)
            .withColumn("_rh", row_hash)
            .groupBy("bucket", "run_id")
            .agg(
                F.count(F.when(is_doc, 1)).alias("doc_count"),
                F.sum(F.size("spans")).alias("span_count"),
                F.expr("bit_xor(_rh)").alias("checksum"),
            )
            .collect()
        }
        bad = []
        for e in entries:
            a = actual.get((e["bucket"], e["run_id"]))
            got = (
                None
                if a is None
                else {
                    "doc_count": int(a["doc_count"]),
                    "span_count": int(a["span_count"]),
                    "checksum": format(a["checksum"] & (2**64 - 1), "016x"),
                }
            )
            want = {k: e[k] for k in ("doc_count", "span_count", "checksum")}
            if got != want:
                bad.append({"bucket": e["bucket"], "run_id": e["run_id"],
                            "expected": want, "actual": got})
        return bad


class IcebergTable:
    """Production path (requires iceberg-spark-runtime on the classpath +
    a configured catalog; unavailable in-sandbox — SURVEY.md §4.4)."""

    def __init__(self, identifier: str) -> None:
        self.identifier = identifier

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("iceberg").load(self.identifier)

    def write_plan(self, df: DataFrame):
        """DataFrameWriterV2 for the append — split out so tests can
        construct the production write plan without a live catalog
        (plan construction needs no Iceberg jar; only execution does)."""
        return df.writeTo(self.identifier).option("write-format", "parquet")

    def write_wave(self, df: DataFrame, run_id: str) -> str:
        self.write_plan(df).append()
        return self.identifier

    def committed_buckets(self) -> set[int]:  # via snapshot summary in prod
        raise NotImplementedError("requires a live Iceberg catalog")


def open_table(root_or_identifier: str):
    if root_or_identifier.startswith("iceberg:"):
        return IcebergTable(root_or_identifier[len("iceberg:"):])
    return ParquetManifestTable(root_or_identifier)
