"""Property tests for the round-5 audit/dedup operators beyond the
oracle hash-compare: prefix-dedup exactness against an independent
Python recomputation, the k-anonymity generalization-ladder
monotonicity invariant, and backlog flow conservation."""

from __future__ import annotations

import pyarrow.parquet as pq

from streamclient_spark.functions.dedup import (
    _PREFIX_JACCARD_MIN,
    _PREFIX_LEN,
    q_dedup_prefix,
)
from streamclient_spark.operators.relational import (
    q_dq_kanon,
    q_orders_backlog,
)


def test_dedup_prefix_matches_pure_python_recomputation(spark, sf_oracle):
    """Every reported pair must carry the exact trigram-Jaccard
    permille a pure-Python recomputation produces, every pair must
    share its 80-char prefix, and the planted near-dup pairs (which
    collide on the prefix by construction) must all surface."""
    rows = q_dedup_prefix(spark, sf_oracle).collect()
    pairs = {(r["a_id"], r["b_id"]): r["jaccard_permille"] for r in rows}
    assert len(pairs) == len(rows) >= 20  # ≥ the planted collisions

    docs = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(f"{sf_oracle}/documents.parquet").to_pylist()
    }
    for (a, b), jp in pairs.items():
        ta, tb = docs[a], docs[b]
        assert a < b
        assert ta[:_PREFIX_LEN] == tb[:_PREFIX_LEN]
        ga = {ta[i : i + 3] for i in range(len(ta) - 2)}
        gb = {tb[i : i + 3] for i in range(len(tb) - 2)}
        expect = len(ga & gb) * 1000 // len(ga | gb)
        assert jp == expect >= _PREFIX_JACCARD_MIN


def test_dq_kanon_risk_monotone_up_the_generalization_ladder(
    spark, sf_oracle
):
    """For NESTED quasi-identifiers, coarsening can only merge
    equivalence classes, so a row below k at a coarser level was below
    k at every finer level: rows_below_k and classes_below_k must be
    non-increasing from L0 (finest) to L2 (coarsest), and min_class
    non-decreasing."""
    rows = {r["level"]: r for r in q_dq_kanon(spark, sf_oracle).collect()}
    l0, l1, l2 = (
        rows["L0:nation+segment+balband"],
        rows["L1:nation+segment"],
        rows["L2:segment"],
    )
    assert l0["rows_below_k"] >= l1["rows_below_k"] >= l2["rows_below_k"]
    assert (
        l0["classes_below_k"] >= l1["classes_below_k"] >= l2["classes_below_k"]
    )
    assert l0["min_class"] <= l1["min_class"] <= l2["min_class"]
    assert l0["n_classes"] >= l1["n_classes"] >= l2["n_classes"]
    for r in rows.values():
        assert 0 <= r["risk_permille"] <= 1000


def test_orders_backlog_conserves_flow(spark, sf_oracle):
    """Sweep-line conservation: every order enters the backlog exactly
    once, every order WITH line items leaves exactly once (this fixture
    has ~1.7% of orders with no line items — they legitimately stay
    open forever), so Σ started = |orders|, Σ shipped = |orders with
    line items|, the final running value is exactly the no-line-item
    count, and the backlog never goes negative."""
    rows = sorted(
        q_orders_backlog(spark, sf_oracle).collect(), key=lambda r: r["day"]
    )
    n_orders = pq.read_table(f"{sf_oracle}/orders.parquet").num_rows
    n_with_items = len(
        {
            r["l_orderkey"]
            for r in pq.read_table(
                f"{sf_oracle}/lineitem.parquet", columns=["l_orderkey"]
            ).to_pylist()
        }
    )
    assert sum(r["started"] for r in rows) == n_orders
    assert sum(r["shipped"] for r in rows) == n_with_items
    assert rows[-1]["backlog"] == n_orders - n_with_items
    assert all(r["backlog"] >= 0 for r in rows)


def test_completeness_schema_map_matches_live_parquet(spark):
    """q_dq_completeness sweeps a LITERAL schema map (shared by the
    builder and the oracle generator). Pin it against the live parquet
    schemas so a regenerated fixture can't silently drop a column from
    the audit."""
    from streamclient_spark.operators.relational import _COMPLETENESS_COLS
    from streamclient_spark.tables import TABLES, load

    assert set(_COMPLETENESS_COLS) == set(TABLES)
    for t in TABLES:
        live = [c for c, _ in load(spark, "/root/testdata/sf0.001", t).dtypes]
        assert list(_COMPLETENESS_COLS[t]) == live, t


def test_audit_scan_cache_serves_both_audits(spark):
    """VERDICT r5 #4: one scan per table per session serves the FD and
    uniqueness audits. After either audit materializes the keyed
    auditscan:* projections, the OTHER audit's executed plan must read
    every one of its tables from InMemoryTableScan."""
    import re

    from streamclient_spark.cacheutil import release_all
    from streamclient_spark.plans.registry import load_all

    release_all()
    sf = "/root/testdata/sf0.001"
    specs = load_all()
    specs["q_dq_fd_audit"].builder(spark, sf).collect()  # materializes
    plan = (
        specs["q_dq_uniqueness"]
        .builder(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # uniqueness audits 8 tables; each must come from the shared cache
    assert len(re.findall(r"InMemoryTableScan", plan)) == 8, plan
    release_all()
