"""Cross-engine numeric helpers for oracle-exact aggregation.

Independently summing doubles in Spark and DuckDB produces results that
differ in the last few ulps (different partial-aggregation orders), so
a value-hash comparison would flap. The fix used across the engine:
sum in *exact* decimal space (both engines implement decimal addition
exactly), then convert once to double — the conversion and any
subsequent IEEE division are deterministic and engine-independent.

This is not just a test trick: at 100 TB, decimal aggregation of money
columns is also the *correct* semantics (no drift across billions of
adds), which is why TPC-H specifies DECIMAL columns in the first place.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scale 4 keeps cents-level data exact and bounds decimal width
DEC = "decimal(27,4)"


def dec_sum(col: Column | str) -> Column:
    """Exact decimal sum, returned as DOUBLE (bit-identical to the
    DuckDB oracle expression ``CAST(SUM(CAST(x AS DECIMAL(27,4))) AS
    DOUBLE)``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dec_avg(col: Column | str, count_col: Column | None = None) -> Column:
    """Mean as (exact decimal sum → double) / count: one IEEE division,
    deterministic in both engines. Oracle shape: ``CAST(SUM(CAST(x AS
    DECIMAL(27,4))) AS DOUBLE) / COUNT(x)``."""
    c = F.col(col) if isinstance(col, str) else col
    cnt = count_col if count_col is not None else F.count(c)
    return dec_sum(c) / cnt


def dec2(col: Column | str) -> Column:
    """Cast a base data column to DECIMAL(12,2) for exact product
    arithmetic. Use on *source* columns (prices, rates with ≤2-decimal
    data) BEFORE multiplying: decimal×decimal is exact and
    engine-identical, whereas casting a computed double product to
    decimal rounds differently across engines (half-up on the exact
    binary expansion vs half-even on the scaled double)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def sql_dec_sum(expr: str) -> str:
    """DuckDB-side twin of :func:`dec_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,4))) AS DOUBLE)"


def sql_dec_avg(expr: str, count_expr: str | None = None) -> str:
    """DuckDB-side twin of :func:`dec_avg`."""
    cnt = count_expr or f"COUNT({expr})"
    return f"{sql_dec_sum(expr)} / {cnt}"
