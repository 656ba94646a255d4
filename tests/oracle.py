"""Local differential harness mirroring the driver's correctness gate.

The driver runs each ``queries()[name]`` in Spark and the matching
``oracle_sql()[name]`` in DuckDB on the same parquet tables, then
compares row-count + schema (column names) + an order-insensitive
value hash. This module reproduces that comparison so regressions are
caught in ``pytest`` before a round ends.

Normalization (both sides): columns sorted by name; each cell rendered
to a canonical string (timestamps → ISO-µs, floats → repr, bytes → hex,
NaN/None → sentinel); rows sorted; the sorted row-tuples compared
exactly. Exact comparison is intentional — the engine's aggregation
conventions (streamclient_spark.compat) are designed to make both
engines produce *identical* values, not merely close ones.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import pandas as pd

from streamclient_spark.tables import TABLES

_SENTINEL_NULL = "\x00NULL"


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return _SENTINEL_NULL
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return _SENTINEL_NULL
        return v.isoformat()
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return cols, out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    """Run both sides, return a diff report dict (empty 'errors' = pass)."""
    sp = spark_df.toPandas()
    con = duckdb_con(sf_dir)
    try:
        du = con.sql(oracle_sql).df()
    finally:
        con.close()

    errors: list[str] = []
    s_cols, s_rows = canonical_rows(sp)
    d_cols, d_rows = canonical_rows(du)
    if s_cols != d_cols:
        errors.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
    if len(s_rows) != len(d_rows):
        errors.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
    if not errors and s_rows != d_rows:
        # find first mismatch for the report
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                errors.append(f"first differing row #{i}: spark={a} duckdb={b}")
                break
        else:
            errors.append("row multiset differs (length equal, tail differs)")
    return {
        "rows": len(s_rows),
        "errors": errors,
    }
