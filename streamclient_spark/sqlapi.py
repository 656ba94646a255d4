"""SQL API surface: run the engine through ``spark.sql`` instead of
the DataFrame builders.

The reference's "query language" is a Python method set
(`/root/reference/services/AlertService.py:26-100`); this engine's
equivalent declarative surface is Spark SQL over the same registered
tables. :func:`register_views` exposes every fixture table as a temp
view (same names the DuckDB oracle harness uses), so any ANSI query —
including most of the registry's oracle strings verbatim — runs
unchanged through Catalyst. This is the parity point that lets a SQL
user switch engines without rewriting queries.

At the 100 TB design point these would be catalog tables (external
parquet/iceberg locations) rather than session temp views; the query
surface is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from streamclient_spark.tables import TABLES, load


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a session temp view named exactly
    as in TESTDATA.md (``region`` ... ``embeddings``), mirroring the
    DuckDB oracle harness's pre-registered views."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run one ANSI-SQL query against the registered fixture views
    (registering them first — idempotent)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
