"""Differential tests on NULL-bearing data.

The driver fixtures carry no NULLs, so the oracle hash-compare never
exercises NULL key/text paths — exactly the dirty data the audit
operators exist for. This suite clones the sf0.001 fixture, injects
NULLs (a NULL document text, NULL FK values, a NULL composite-key
component), and re-runs the full cross-engine compare for the
operators whose NULL handling is hand-built:

- q_dq_referential: NULL child FK must stay a per-edge orphan group
  (the packed-key sentinel), NULL parent keys must match nothing.
- q_dq_uniqueness: the key fingerprint must keep (1, NULL), (NULL, 1)
  and NULL-vs-empty distinct (concat_ws alone merges them).
- q_text_normalize / q_dedup_substring: a NULL text must produce a
  NULL norm / zero spans, not a crashed job.
- q_dq_fd_audit: a NULL lhs must form its own per-FD group on both
  engines and a NULL rhs must be SKIPPED by count(DISTINCT) on both
  (the NULL-guarded struct — count(DISTINCT a, b) over the typed
  column pair would otherwise drop every row).
- q_feature_pit: unkeyed events (NULL user_id or ts) are excluded by
  contract on BOTH engines; a NULL value must not poison the window
  sums (both engines skip NULL in SUM).
- q_customer_migration: a NULL o_orderdate must land in period 1 (the
  oracle CASE's ELSE branch) on both engines, never silently drop the
  customer's revenue from the tercile rank.
"""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from streamclient_spark.plans.registry import load_all
from streamclient_spark.tables import TABLES
from tests.oracle import compare

SF_SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf_nulls(tmp_path_factory) -> str:
    """sf0.001 clone with NULLs planted in documents.text,
    lineitem.l_partkey, and lineitem.l_linenumber."""
    d = tmp_path_factory.mktemp("sfnull")
    for t in TABLES:
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")

    docs = pq.read_table(d / "documents.parquet")
    text = docs.column("text").to_pylist()
    text[0] = None  # one NULL document
    # vertical-tab-bearing text (ADVICE r10): \x0b is whitespace to
    # java's \s but NOT to the oracle's RE2 \s — the fertility
    # translate set must match the ORACLE (keep \x0b as payload)
    text[1] = "alpha\x0bbeta gamma\tdelta\nepsilon\fzeta\reta " + (
        text[1] or ""
    )
    docs = docs.set_column(
        docs.schema.get_field_index("text"), "text", pa.array(text)
    )
    pq.write_table(docs, d / "documents.parquet")

    li = pq.read_table(d / "lineitem.parquet")
    pk = li.column("l_partkey").to_pylist()
    ln = li.column("l_linenumber").to_pylist()
    pk[0] = None  # NULL FK on one edge...
    pk[1] = None  # ...twice, so the NULL group has c=2
    ln[2] = None  # NULL component of the composite candidate key
    li = li.set_column(
        li.schema.get_field_index("l_partkey"),
        "l_partkey",
        pa.array(pk, type=li.schema.field("l_partkey").type),
    )
    li = li.set_column(
        li.schema.get_field_index("l_linenumber"),
        "l_linenumber",
        pa.array(ln, type=li.schema.field("l_linenumber").type),
    )
    pq.write_table(li, d / "lineitem.parquet")

    # events: NULL user_id / ts / value (feature_pit exclusion contract
    # + FD-audit lhs NULL group), NULL event_type (FD rhs NULL skip)
    ev = pq.read_table(d / "events.parquet")
    cols = {c: ev.column(c).to_pylist() for c in
            ("user_id", "ts", "value", "event_type")}
    cols["user_id"][0] = None
    cols["ts"][1] = None
    cols["value"][2] = None
    cols["event_type"][3] = None
    for c, vals in cols.items():
        ev = ev.set_column(
            ev.schema.get_field_index(c),
            c,
            pa.array(vals, type=ev.schema.field(c).type),
        )
    pq.write_table(ev, d / "events.parquet")

    # part: NULL p_brand — a NULL STRING lhs for part.p_brand->p_type
    # and a NULL rhs for part.p_partkey->p_brand in one plant
    pt = pq.read_table(d / "part.parquet")
    brand = pt.column("p_brand").to_pylist()
    brand[0] = None
    pt = pt.set_column(
        pt.schema.get_field_index("p_brand"),
        "p_brand",
        pa.array(brand, type=pt.schema.field("p_brand").type),
    )
    pq.write_table(pt, d / "part.parquet")

    # embeddings: a NULL label, a NULL embedding, and an all-zero
    # vector, all on SAMPLED vec_ids (< 1000) — q_embed_sim_hist must
    # (a) exclude the NULL label from pairing (the oracle's equi-join
    # matches nothing on NULL), (b) emit NULL cosines for pairs
    # involving the NULL embedding, and (c) emit NULL for the
    # zero-norm vector's pairs (DuckDB defines x/0 as NULL; numpy
    # would produce NaN/inf, which hash differently).
    em = pq.read_table(d / "embeddings.parquet")
    lab = em.column("label").to_pylist()
    vecs = em.column("embedding").to_pylist()
    lab[0] = None
    vecs[1] = None
    vecs[2] = [0.0] * len(vecs[2])
    em = em.set_column(
        em.schema.get_field_index("label"),
        "label",
        pa.array(lab, type=em.schema.field("label").type),
    )
    em = em.set_column(
        em.schema.get_field_index("embedding"),
        "embedding",
        pa.array(vecs, type=em.schema.field("embedding").type),
    )
    pq.write_table(em, d / "embeddings.parquet")

    # orders: NULL o_orderdate — q_customer_migration's period CASE
    # must route NULL dates to the ELSE branch (period 1) on both
    # engines instead of silently dropping those customers.
    od = pq.read_table(d / "orders.parquet")
    dates = od.column("o_orderdate").to_pylist()
    dates[0] = None
    od = od.set_column(
        od.schema.get_field_index("o_orderdate"),
        "o_orderdate",
        pa.array(dates, type=od.schema.field("o_orderdate").type),
    )
    pq.write_table(od, d / "orders.parquet")
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "q_dq_referential",
        "q_dq_uniqueness",
        "q_dq_fd_audit",
        "q_text_normalize",
        "q_dedup_substring",
        "q_feature_pit",
        "q_events_bot_detection",
        "q_text_template_detection",
        "q_customer_migration",
        # round-8 rewrites: the NULL o_orderdate plant exercises
        # q_lead_time's NULL-gap rank discipline (COUNT(*) includes
        # NULL gaps, percentiles/min/max skip them) and q_tpch_q10's
        # quarter-filter NULL exclusion; the NULL document text
        # exercises q_quality_cut's NULL alpha_permille ordering
        # (DESC NULLS LAST on both engines).
        "q_lead_time",
        "q_tpch_q10",
        "q_quality_cut",
        # r8 review finding: the GEMM rewrite must keep the oracle's
        # dirty-embedding arithmetic — NULL label pairs with nothing,
        # NULL embedding and zero-norm vectors yield NULL cosines.
        "q_embed_sim_hist",
        # r10 one-pass rewrite: the per-half exact counts became
        # conditional SUMs over the distinct (half, user_id) pair
        # table — the NULL user_id pair must be skipped (the oracle's
        # count(DISTINCT CASE ...) ignores NULLs) while the NULL-ts
        # (NULL half) pair still counts toward the union distinct,
        # and the NULL-user register row must keep matching the
        # oracle's md5(NULL) propagation.
        "q_agg_hll_merge",
        # ADVICE r10: the payload count must treat \x0b as PAYLOAD
        # (RE2/oracle \s), not whitespace (java \s) — the planted
        # vertical-tab doc hash-mismatches under the old 6-char set
        "q_text_fertility",
    ],
)
def test_null_bearing_fixture_still_hash_matches(spark, sf_nulls, name):
    spec = load_all()[name]
    rep = compare(spec.builder(spark, sf_nulls), spec.oracle, sf_nulls)
    assert not rep["errors"], (name, rep["errors"])


def test_referential_reports_null_fk_as_orphans(spark, sf_nulls):
    """The two NULL l_partkey rows must surface as ONE orphan key with
    two orphan rows under the lineitem->part edge (the oracle's LEFT
    JOIN semantics: NULL matches no parent), not vanish or merge
    across edges."""
    rows = {
        r["fk_edge"]: r
        for r in load_all()["q_dq_referential"]
        .builder(spark, sf_nulls)
        .collect()
    }
    edge = rows["lineitem.l_partkey->part.p_partkey"]
    assert edge["n_orphan_keys"] >= 1
    assert edge["n_orphan_rows"] >= 2
    clean = rows["lineitem.l_suppkey->supplier.s_suppkey"]
    assert clean["n_orphan_keys"] == 0


@pytest.fixture(scope="module")
def sf_rank_boundary(tmp_path_factory) -> str:
    """sf0.001 clone plus a synthetic '0-BOUNDARY  ' priority group of
    exactly 10 single-line orders whose day gaps are 1..10 — n
    divisible by 10 with a histogram row closing exactly at rank
    0.9·n. This is the case where a float rank test
    ``cum >= lit(0.9)*n`` silently disagrees with DuckDB's
    exact-rational percentile_disc: binary 0.9 rounds UP by 2.2e-17,
    so 9 >= 0.9*10 is FALSE in doubles while DuckDB returns 9
    (probed in the r9 fix; see q_lead_time's docstring)."""
    import datetime

    d = tmp_path_factory.mktemp("sfboundary")
    for t in TABLES:
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")

    od = pq.read_table(d / "orders.parquet")
    li = pq.read_table(d / "lineitem.parquet")
    base_key = 900_000_000
    t0 = datetime.datetime(1995, 6, 1)
    new_orders = {
        "o_orderkey": [base_key + i for i in range(10)],
        "o_custkey": [1] * 10,
        "o_orderstatus": ["F"] * 10,
        "o_totalprice": [1.0] * 10,
        "o_orderdate": [t0] * 10,
        "o_orderpriority": ["0-BOUNDARY  "] * 10,
    }
    new_lines = {
        "l_orderkey": [base_key + i for i in range(10)],
        "l_partkey": [1] * 10,
        "l_suppkey": [1] * 10,
        "l_linenumber": [1] * 10,
        "l_quantity": [1.0] * 10,
        "l_extendedprice": [1.0] * 10,
        "l_discount": [0.0] * 10,
        "l_tax": [0.0] * 10,
        "l_returnflag": ["N"] * 10,
        "l_linestatus": ["O"] * 10,
        # gaps 1..10 days: p50 = 5 (2k>=n at k=5), p90 = 9 (10k>=9n)
        "l_shipdate": [
            t0 + datetime.timedelta(days=i + 1) for i in range(10)
        ],
    }
    od2 = pa.concat_tables(
        [od, pa.table(new_orders).cast(od.schema.remove_metadata())]
    )
    li2 = pa.concat_tables(
        [li, pa.table(new_lines).cast(li.schema.remove_metadata())]
    )
    pq.write_table(od2, d / "orders.parquet")
    pq.write_table(li2, d / "lineitem.parquet")
    return str(d)


def test_lead_time_percentile_rank_boundary_exact(spark, sf_rank_boundary):
    """r9 (ADVICE r8): the discrete-percentile rank test must be
    integer-exact at the divisible-by-10 boundary — full cross-engine
    hash compare on the boundary fixture, plus a direct value check
    of the planted group."""
    spec = load_all()["q_lead_time"]
    rep = compare(
        spec.builder(spark, sf_rank_boundary), spec.oracle, sf_rank_boundary
    )
    assert not rep["errors"], rep["errors"]
    row = {
        r["o_orderpriority"]: r
        for r in spec.builder(spark, sf_rank_boundary).collect()
    }["0-BOUNDARY  "]
    assert (row["n"], row["min_days"], row["p50_days"],
            row["p90_days"], row["max_days"]) == (10, 1, 5, 9, 10)


@pytest.fixture(scope="module")
def sf_bigdoc(tmp_path_factory) -> str:
    """sf0.001 clone with one 2.2M-char all-alnum document — above the
    ~2.147M alnum chars where an int32 ``(len-len)*1000`` wraps
    negative (ADVICE r8: the length difference must be cast to LONG
    before the multiply; DuckDB computes in BIGINT natively)."""
    d = tmp_path_factory.mktemp("sfbigdoc")
    for t in TABLES:
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")
    docs = pq.read_table(d / "documents.parquet")
    text = docs.column("text").to_pylist()
    nch = docs.column("n_chars").to_pylist()
    text[0] = "a" * 2_200_000
    nch[0] = 2_200_000
    docs = docs.set_column(
        docs.schema.get_field_index("text"), "text", pa.array(text)
    )
    docs = docs.set_column(
        docs.schema.get_field_index("n_chars"),
        "n_chars",
        pa.array(nch, type=docs.schema.field("n_chars").type),
    )
    pq.write_table(docs, d / "documents.parquet")
    return str(d)


def test_quality_cut_no_int32_overflow_on_huge_doc(spark, sf_bigdoc):
    """r9 (ADVICE r8): the permille numerator must be computed in
    LONG — cross-engine hash compare with a >2^31/1000-char document,
    plus a direct check that the planted doc scores 1000 permille
    (int32 wrap would send it negative)."""
    spec = load_all()["q_quality_cut"]
    rep = compare(spec.builder(spark, sf_bigdoc), spec.oracle, sf_bigdoc)
    assert not rep["errors"], rep["errors"]
    doc0 = [
        r
        for r in spec.builder(spark, sf_bigdoc).collect()
        if r["alpha_permille"] == 1000
    ]
    assert doc0, "the all-alnum 2.2M-char doc must score exactly 1000"


@pytest.fixture(scope="module")
def sf_dirty_supplier(tmp_path_factory) -> str:
    """sf0.001 clone with one NULL and one orphan (999) supplier
    nationkey — the rows the oracle's INNER supplier⋈nation join
    drops. q_tpch_q8's r9 literal-fold must reproduce that drop with
    its isin over the fixed dim, not keep the rows in the
    denominator."""
    d = tmp_path_factory.mktemp("sfdirtysupp")
    for t in TABLES:
        shutil.copy(f"{SF_SRC}/{t}.parquet", d / f"{t}.parquet")
    sup = pq.read_table(d / "supplier.parquet")
    nk = sup.column("s_nationkey").to_pylist()
    nk[0] = None
    nk[1] = 999  # orphan: matches no nation row
    sup = sup.set_column(
        sup.schema.get_field_index("s_nationkey"),
        "s_nationkey",
        pa.array(nk, type=sup.schema.field("s_nationkey").type),
    )
    pq.write_table(sup, d / "supplier.parquet")
    return str(d)


@pytest.mark.parametrize("name", ["q_tpch_q7", "q_tpch_q8", "q_tpch_q9"])
def test_tpch_literal_fold_drops_dirty_suppliers(
    spark, sf_dirty_supplier, name
):
    """r9: the q8/q9 rewrites folded the supplier⋈nation join into a
    literal isin (+ map lookup in q9) — full cross-engine hash
    compare on a fixture where the fold and the join could diverge
    (NULL + orphan nationkeys)."""
    spec = load_all()[name]
    rep = compare(
        spec.builder(spark, sf_dirty_supplier),
        spec.oracle,
        sf_dirty_supplier,
    )
    assert not rep["errors"], rep["errors"]
