"""Query registry: named DataFrame builders + matching DuckDB oracle SQL.

Driver contract (__spark_entry__.py): every operator from SURVEY.md §2
is exposed as ``queries()[name]`` (spark, sf_dir) → DataFrame, with an
equivalent ANSI-SQL ``oracle_sql()[name]`` where SQL-expressible; the
driver compares row-count + schema + order-insensitive value hash at
sf0.01.  Column-name parity and in-query rounding of float aggregates
(so both engines emit the identical canonical value) are handled at
definition site.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → driver does a rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all() -> None:
    """Import every query module (side effect: fills QUERIES/ORACLES)."""
    from ocr_spark.plans import (  # noqa: F401
        queries_extract,
        queries_more,
        queries_rel,
        queries_text,
        queries_vec,
    )
