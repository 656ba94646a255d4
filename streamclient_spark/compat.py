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


# ---------------------------------------------------------------------------
# Fast exact aggregation: two-limb long sums
# ---------------------------------------------------------------------------
#
# Spark's decimal sum accumulator above 18 digits is BigDecimal-backed
# (boxed, allocation per add) — measured 12 s vs 0.7 s for TPC-H Q1 at
# 60M rows against the all-long formulation. The limb API below keeps
# the EXACT-arithmetic contract of dec_sum at long-sum speed: scale the
# money value to an exact integer, split it into (hi = x >> shift,
# lo = x & (2^shift - 1)), sum both limbs as plain longs (whole-stage
# codegen, no boxing), and reassemble hi·2^shift + lo in decimal AFTER
# aggregation (|groups| rows, cost-free). The reassembled value is the
# same exact rational dec_sum produces, so the double conversion — and
# the oracle hash — are bit-identical.
#
# Overflow margins (shift=20, values non-negative): a limb sum overflows
# int64 only past ~2^63 / max(x)/2^shift rows per group-partition; for
# Q1's charge measure (x ≤ ~1.2e11 at scale 1e6) that is ~8e13 rows per
# group — three orders past the 100 TB design point's largest group.


def scaled2(col: Column | str) -> Column:
    """Exact cents: ``round(x·100)`` as BIGINT. Money/rate columns in
    the fixtures carry ≤2 decimals, so this is the same rational value
    ``dec2``/``DECIMAL`` casts produce (no boundary-rounding risk: the
    doubles sit within 1e-9 of an exact cent)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def limb_sums(x: Column, prefix: str, shift: int = 20) -> list[Column]:
    """The two aggregate expressions for an exact long-limb sum of the
    non-negative BIGINT measure ``x``; pair with :func:`limb_value` in
    a post-aggregation select."""
    return [
        F.sum(F.shiftright(x, shift)).alias(f"_{prefix}_hi"),
        F.sum(x.bitwiseAND(F.lit((1 << shift) - 1))).alias(f"_{prefix}_lo"),
    ]


def limb_value(prefix: str, frac_digits: int, shift: int = 20) -> Column:
    """Reassemble ``limb_sums`` into the exact total and convert once
    to DOUBLE: (hi·2^shift + lo) · 10^-frac_digits. The product against
    the small decimal literal keeps the arithmetic in exact decimal
    space (scale = frac_digits) before the final cast."""
    from decimal import Decimal

    numer = (
        F.col(f"_{prefix}_hi").cast("decimal(38,0)")
        * F.lit(1 << shift)
        + F.col(f"_{prefix}_lo").cast("decimal(38,0)")
    )
    return (numer * F.lit(Decimal(1).scaleb(-frac_digits))).cast("double")


def sql_dec_sum(expr: str) -> str:
    """DuckDB-side twin of :func:`dec_sum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,4))) AS DOUBLE)"


def sql_dec_avg(expr: str, count_expr: str | None = None) -> str:
    """DuckDB-side twin of :func:`dec_avg`."""
    cnt = count_expr or f"COUNT({expr})"
    return f"{sql_dec_sum(expr)} / {cnt}"


def sql_star_cc(edges_cte: str, rounds: int, labels_name: str = "star_labels") -> str:
    """CTE-chain fragment computing connected components by the same
    alternating large-star/small-star half-steps as
    ``scale.connected_components_star``, unrolled ``rounds`` times.

    ``edges_cte`` must be the NAME of an earlier CTE with columns
    ``(u, v)`` (any orientation, self-loops tolerated). Emits CTEs
    ``e1..e{rounds+1}`` plus ``{labels_name}(node, component)`` where
    component = the component's minimum node id (isolated nodes — no
    edges — are absent, exactly like the engine kernel). Every CTE is
    MATERIALIZED: DuckDB inlines plain CTEs per reference, which makes
    an unrolled recurrence exponential (measured: fd exhaustion at 8
    rounds). A converged edge set is a fixpoint of both half-steps, so
    any ``rounds`` ≥ the engine's convergence round yields the
    identical labeling."""
    parts = [
        f", e1 AS MATERIALIZED (SELECT greatest(u, v) AS a,"
        f" least(u, v) AS b FROM {edges_cte} WHERE u <> v)"
    ]
    prev = "e1"
    for i in range(2, rounds + 2):
        parts.append(f"""
    , sym{i} AS MATERIALIZED (SELECT a AS u, b AS v FROM {prev}
                 UNION ALL SELECT b, a FROM {prev})
    , ls{i} AS MATERIALIZED (
        SELECT DISTINCT s.v AS a, m.m AS b
        FROM sym{i} s
        JOIN (SELECT u, least(min(v), u) AS m FROM sym{i} GROUP BY u) m
          USING (u)
        WHERE s.v > s.u
    )
    , bm{i} AS MATERIALIZED (SELECT a, min(b) AS m FROM ls{i} GROUP BY a)
    , e{i} AS MATERIALIZED (
        SELECT DISTINCT a, b FROM (
          SELECT l.a, bm.m AS b FROM ls{i} l JOIN bm{i} bm USING (a)
          UNION ALL
          SELECT l.b AS a, bm.m AS b FROM ls{i} l JOIN bm{i} bm USING (a)
          WHERE l.b <> bm.m
        )
    )""")
        prev = f"e{i}"
    parts.append(f"""
    , {labels_name} AS MATERIALIZED (
        SELECT a AS node, b AS component FROM {prev}
        UNION ALL
        SELECT b, b FROM (SELECT DISTINCT b FROM {prev}
                          WHERE b NOT IN (SELECT DISTINCT a FROM {prev}))
    )""")
    return "".join(parts)
