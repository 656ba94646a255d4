"""Query registry: the single source of truth for the engine's surface.

Every operator from SURVEY.md §2 is registered here under its stable
query name with (a) a builder ``(spark, sf_dir) -> DataFrame`` and (b)
optionally the equivalent ANSI-SQL oracle string that DuckDB can run on
the same parquet tables. ``__spark_entry__.py`` re-exports this mapping
to the driver; ``bench.py`` times a headline subset; tests run the full
differential comparison locally.

Oracle-parity conventions (SURVEY.md §7 Milestone 2 risk notes):

- **Float aggregates** go through exact decimal arithmetic so both
  engines produce bit-identical doubles: ``SUM(CAST(x AS
  DECIMAL(18,4)))`` is exact and engine-independent; casting that back
  to DOUBLE (and dividing by a COUNT for means) is deterministic IEEE
  arithmetic. Never hash a naively-summed double.
- **Timestamps**: the ``events.ts`` column is parquet ``timestamp[ns]``;
  Spark truncates to microseconds on read, so every oracle wraps it in
  ``CAST(ts AS TIMESTAMP)`` (DuckDB ns→us truncation) to match.
- **Column names** are aliased identically on both sides (the driver
  sorts columns by name before hashing).
- **Limits/top-k** always carry a total order (unique tie-break key) so
  the selected row *set* is deterministic even though the hash is
  order-insensitive.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: Optional[str]  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name`` with its oracle."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so the registry is fully populated."""
    import streamclient_spark.operators.reference  # noqa: F401
    import streamclient_spark.operators.relational  # noqa: F401
    import streamclient_spark.operators.scans  # noqa: F401
    import streamclient_spark.operators.window  # noqa: F401
    import streamclient_spark.operators.scalar_fns  # noqa: F401
    import streamclient_spark.functions.dedup  # noqa: F401
    import streamclient_spark.functions.similarity  # noqa: F401
    import streamclient_spark.functions.text  # noqa: F401
    import streamclient_spark.functions.multimodal  # noqa: F401
    import streamclient_spark.operators.udf_surface  # noqa: F401

    return REGISTRY
