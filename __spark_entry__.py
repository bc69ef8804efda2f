"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ocr_spark package; this module only
re-exports the registry (SURVEY.md §2 operator inventory).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full E1→E7 extraction of
    the deterministic synthetic interleaved corpus → exploded span table
    (doc_id, span_idx, kind, text, media_ref, span_order)."""
    from ocr_spark.operators.extract import explode_extracted, extract_stage
    from ocr_spark.sources.corpus import generate_interleaved

    docs = generate_interleaved(spark, 200, seed=42, partitions=8, mega_every=100)
    return explode_extracted(extract_stage(docs))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ocr_spark.plans import registry

    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    rows-only ops (approx sketches, seeded LSH, Python payload parsing)
    intentionally have no entry."""
    from ocr_spark.plans import registry

    registry.load_all()
    return dict(registry.ORACLES)
