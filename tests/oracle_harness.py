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
        # pandas fetch renders DuckDB DATE as midnight Timestamp while
        # Spark toPandas keeps datetime.date — normalize to one form
        return v.strftime("%Y-%m-%d 00:00:00.000000")
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


#: DuckDB result types that the driver's pandas fetch (`rel.df()`)
#: silently coerces to float64 — if Spark's matching column is integral
#: the value hash diverges even when every value is equal (the r04
#: `vec_quantize_int8` failure: HUGEINT list_sum → -597.0 vs -597).
_WIDENED_DUCK_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")

_SPARK_INTEGRAL = ("byte", "short", "int", "integer", "long", "bigint")


def check_widened_types(spark_df, rel) -> list[str]:
    """Return columns where the oracle's DuckDB type is HUGEINT /
    UHUGEINT / DECIMAL while Spark's column is integral — a guaranteed
    driver hash mismatch regardless of values.  Checked from
    ``rel.types`` before any fetch, so it is cheap and deterministic;
    takes the already-built relation so compare() plans the SQL once."""
    spark_types = {f.name: f.dataType.simpleString() for f in spark_df.schema.fields}
    bad = []
    for col, dtyp in zip(rel.columns, rel.types):
        d = str(dtyp).upper()
        if any(w in d for w in _WIDENED_DUCK_TYPES):
            if spark_types.get(col, "") in _SPARK_INTEGRAL:
                bad.append(f"{col} (duck {d} vs spark {spark_types.get(col)})")
    return bad


def _depandas(pdf) -> list[tuple]:
    """pandas DataFrame → list of row tuples with numpy scalars
    unwrapped to Python scalars (np.int64 → int, np.float64 → float,
    np.bool_ → bool, pd.Timestamp → datetime) so _norm sees the same
    value space from both engines."""
    import numpy as np

    rows = []
    for row in pdf.itertuples(index=False, name=None):
        out = []
        for v in row:
            if isinstance(v, np.generic):
                v = v.item()
            elif type(v).__name__ == "Timestamp":
                v = v.to_pydatetime()
            elif type(v).__name__ == "NaTType":
                v = None
            out.append(v)
        rows.append(tuple(out))
    return rows


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    # Fetch BOTH engines through the pandas path the driver uses
    # (`toPandas()` / `rel.df()`): dtype coercions the driver would see
    # (DuckDB HUGEINT→float64, nullable int→float64+NaN) happen here
    # too, so a local pass really predicts a driver pass (the r03 list
    # cells and r04 HUGEINT failures were both invisible to a
    # fetchall()-based replica).
    rel = con.sql(sql)
    widened = check_widened_types(spark_df, rel)
    if widened:
        raise AssertionError(
            "oracle emits pandas-widened numeric types against integral "
            f"Spark columns — guaranteed driver hash mismatch: {widened}; "
            "CAST(... AS BIGINT) in the oracle SQL")
    s_pdf = spark_df.toPandas()
    s_rows = _depandas(s_pdf)
    s_cols = list(s_pdf.columns)
    d_pdf = rel.df()
    d_cols = list(d_pdf.columns)
    d_rows = _depandas(d_pdf)
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
