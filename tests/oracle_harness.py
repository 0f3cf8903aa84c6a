"""Spark-vs-DuckDB comparison mimicking the driver's correctness gate:
row count + column names + order-insensitive value equality, with exact
value comparison (no tolerance) so any cross-engine drift fails loudly.

DRIVER-FAITHFUL FETCH: the driver canonicalizes the DuckDB side through
pandas, where HUGEINT (DuckDB's SUM(<integer>) result type) degrades to
float64 (`5` -> `5.0`) and the value hash diverges.  Fetching here via
``rel.fetchall()`` would hide that class of bug (fetchall converts
HUGEINT to exact Python int), so we fetch via ``rel.df()`` — an oracle
whose final projection leaves an un-cast integer SUM fails locally the
same way it fails at the driver.
"""

from __future__ import annotations

import datetime
import decimal
import math
from typing import Any


def _norm(v: Any) -> str:
    # numpy scalars (pandas fetch path) -> plain Python values first,
    # so e.g. np.float64 reprs identically to Spark's float.
    if type(v).__module__ == "numpy" and hasattr(v, "item"):
        v = v.item()
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            # pandas renders SQL NULL in numeric columns as NaN; fold
            # both null spellings together (symmetric on both sides).
            return "␀"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return format(v, "f")
    if isinstance(v, datetime.datetime):
        if v != v:  # pandas NaT
            return "␀"
        # DuckDB DATE arrives from pandas as a midnight Timestamp while
        # Spark yields datetime.date; collapse naive midnights to the
        # date form (applied to both engines, so exact-equality holds).
        if v.tzinfo is None and v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    """Sort columns by name (driver semantics), normalize values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_spark_duckdb(spark_df, duck_con, oracle_sql: str) -> None:
    """Assert the Spark result and DuckDB oracle match exactly."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    rel = duck_con.sql(oracle_sql)
    pdf = rel.df()  # pandas fetch = the driver's canonicalization path
    d_cols = list(pdf.columns)
    d_rows = list(pdf.itertuples(index=False, name=None))

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = normalize_rows(s_cols, s_rows)
    dn = normalize_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
