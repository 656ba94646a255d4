"""Differential test: every registered query with an oracle must match
DuckDB exactly at the driver's correctness scale factor (sf0.01)."""

from __future__ import annotations

import pytest

from streamclient_spark.plans.registry import load_all
from tests.oracle import compare

SPECS = load_all()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in SPECS.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_oracle, name):
    spec = SPECS[name]
    report = compare(spec.builder(spark, sf_oracle), spec.oracle, sf_oracle)
    assert not report["errors"], f"{name}: {report['errors']}"
    assert report["rows"] >= 0


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_oracle, name):
    spec = SPECS[name]
    df = spec.builder(spark, sf_oracle)
    assert df.count() >= 0
