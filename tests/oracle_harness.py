"""Replica of the driver's DuckDB-oracle comparison (SURVEY.md §5.2).

Canonicalization: columns sorted by name, rows sorted by their full
string form, values normalized (floats via repr of the double, timestamps
via ISO format, NULL as a sentinel).  Any mismatch the driver could see
shows up here first — and this harness is STRICTER than a hash compare
because it diffs the first few offending rows for debugging.
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


class UnhashableCellError(TypeError):
    """An oracle-checked result carried a list/dict/ndarray cell — the
    driver's canonicalizer pandas-sorts all columns and dies on these
    (`TypeError: unhashable type: 'list'`, the round-3
    text_extract_entities failure).  The harness must be at least as
    strict as the driver, so such cells are a hard error here too."""


def _norm(v: Any) -> str:
    if isinstance(v, (list, tuple, set, dict)) or type(v).__name__ == "ndarray":
        raise UnhashableCellError(
            f"oracle-checked query emitted a non-scalar cell ({type(v).__name__}):"
            f" {v!r} — array_join/array_to_string it to a scalar column"
        )
    if v is None:
        return "␀NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (int,)):
        return str(v)
    try:  # decimal from DuckDB sums
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(int(v)) if v == int(v) else repr(float(v))
    except Exception:
        pass
    return str(v)


def canonical(rows: list[tuple], cols: list[str]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = [tuple(r) for r in rel.fetchall()]
    res = {
        "rows_spark": len(s_rows),
        "rows_duck": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duck": sorted(d_cols),
        "match": False,
        "diff": None,
    }
    if sorted(s_cols) != sorted(d_cols):
        res["diff"] = f"column mismatch: {sorted(s_cols)} vs {sorted(d_cols)}"
        return res
    a = canonical(s_rows, s_cols)
    b = canonical(d_rows, d_cols)
    if a == b:
        res["match"] = True
        return res
    if len(a) != len(b):
        res["diff"] = f"row count mismatch {len(a)} vs {len(b)}"
    sb, sa = set(b), set(a)
    extra_a = [x for x in a if x not in sb][:2]
    extra_b = [y for y in b if y not in sa][:2]
    res["diff"] = (res["diff"] or "value diff") + f"; only-spark: {extra_a}; only-duck: {extra_b}"
    return res
