"""SQL-surface parity: ANSI oracle strings run through Spark SQL
itself and must produce the same rows as the DataFrame builders.

This is the "a SQL user could switch engines" attestation: the same
query text executes on DuckDB (oracle harness) AND on Catalyst via
``spark.sql``, and both match the DataFrame-API formulation. Only
oracles written in the ANSI-common subset qualify — DuckDB-specific
forms (list lambdas, ``string_split_regex``, ``QUALIFY``...) are
exactly why the registry carries per-engine twins.
"""

from __future__ import annotations

import pytest

from streamclient_spark.plans.registry import load_all
from streamclient_spark.sqlapi import sql
from tests.oracle import canonical_rows

SPECS = load_all()

# oracle strings known to be in the ANSI-common subset of both engines
ANSI_PORTABLE = [
    "q_agg_tpch_q1",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q22",
    "q_case_when",
    "q_filter_compound",
    "q_join_broadcast",
    # round-2 late additions whose oracles are ANSI-portable
    "q_agg_mode",
    "q_events_hourly_rollup",
    "q_agg_stats",
    "q_rank_global",
    "q_fn_conditional",
    "q_seq_pattern",
]


@pytest.mark.parametrize("name", ANSI_PORTABLE)
def test_oracle_sql_runs_on_spark_and_matches_builder(
    spark, sf_oracle, name
):
    spec = SPECS[name]
    via_sql = sql(spark, sf_oracle, spec.oracle).toPandas()
    via_df = spec.builder(spark, sf_oracle).toPandas()
    assert canonical_rows(via_sql) == canonical_rows(via_df)
