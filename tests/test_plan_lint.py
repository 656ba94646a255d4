"""Whole-surface plan lint: every registered query's physical plan is
swept for patterns that do not survive scale, with explicit allowlists
for the places they are the intended plan. Complements the targeted
shape assertions in test_plans.py — a new query cannot silently ship a
row-at-a-time Python stage or an unintended cartesian product just
because nobody wrote it a dedicated test."""

from __future__ import annotations

import contextlib
import io

from streamclient_spark.plans.registry import load_all

#: BatchEvalPython = row-at-a-time Python. Banned everywhere except the
#: query whose PURPOSE is the Python UDTF extension point.
ROW_PYTHON_ALLOWED = {"q_udtf_explode"}

#: BroadcastNestedLoopJoin is legitimate exactly where the build side
#: is a single-row scalar (totals / thresholds / cutoff timestamps —
#: the standard decorrelated-scalar-subquery plan) or where the query
#: IS a cross join.
BNLJ_ALLOWED = {
    "q_join_cross",       # the cross-join operator itself
    "q_state_open",       # 1-row TTL-cutoff scalar
    "q_ttl_filter",       # 1-row cutoff scalar
    "q_tpch_q11",         # 1-row national-total threshold
    "q_tpch_q22",         # 1-row average-balance scalar
    "q_tpch_q15",         # 1-row max-revenue scalar (AQE-dependent)
    "q_tpch_q17",         # 1-row scalar variants under default confs
    "q_text_tfidf",       # 1-row corpus document count (idf)
    "q_text_keywords",    # same 1-row corpus-count scalar as tfidf
    "q_text_surprisal",   # 1-row corpus token total
    "q_subquery_scalar",  # scalar-subquery demo
    "q_sample_weights",   # 1-row max-weight scalar
    "q_dq_skew",          # 1-row table-total scalar (permille share)
    "q_bucketize",        # 1-row decile-boundary scalar broadcast
    "q_mixture_report",   # 1-row corpus-total scalar (permille share)
    "q_text_kl_drift",    # 1-row corpus-token-total scalar (log2 N)
    "q_mixture_temperature",  # 1-row normalizer scalar (Σ√chars)
    "q_part_price_index",  # 1-row base-month scalar broadcast
    "q_orders_repeat_interval",  # 1-row repeat-total scalar (share)
    "q_embed_pair_margin",  # 1-row corpus-count scalar (cross term)
    "q_dq_freshness",     # 1-row corpus-watermark scalar
    "q_graph_triangles",  # 1-row triangle/wedge/edge scalars
    "q_market_basket",    # 1-row corpus-size scalar (lift)
    "q_text_bm25",        # 1-row corpus stats scalar (N, avgdl)
    "q_text_collocations",  # 1-row total-bigram scalar (PMI N)
    "q_events_rfm",       # 1-row corpus-watermark + N scalars
    "q_pareto_abc",       # 1-row grand-total scalar (ABC share)
    "q_ts_acf",           # 1-row min-day + series-stats scalars
    "q_ts_cross_corr",    # 1-row min-day + two series-stats scalars
    "q_ts_theil_sen",     # 1-row min-day scalar
    "q_graph_assortativity",  # 1-row node-count scalar
    "q_mixture_epochs",   # 1-row budget/quota scalar
    "q_graph_modularity",  # 1-row edge-count scalar (m in Q formula)
    "q_dq_drift",         # 1-row day-bounds + reference-bounds scalars
    "q_events_cohort_ltv",  # 1-row min-day + max-week scalars
    "q_ts_stl",           # 1-row min-day scalar (day indexing)
    "q_sim_rrf",          # 1-row query-vector + BM25 corpus-stats scalars
    "q_agg_bloom",        # 1-row member-count + bits-set scalars
    "q_graph_hits",       # 1-row max-authority normalization scalar
    "q_agg_hll_merge",    # 1-row per-sketch estimate + exact-audit scalars
    "q_events_growth_accounting",  # 1-row min-day + max-week scalars
    "q_events_rolling_wau",  # 1-row min-day + max-day scalars
    "q_part_abc_xyz",     # 1-row week-span + revenue-total scalars
    "q_supplier_scorecard",  # 1-row spine-count scalar (per-tag rank
                             # rebase: r = grk − tag·|spine|)
    "q_knn_classify",     # bounded 100-row pilot-query broadcast: the
                          # intended plan is every corpus row scoring
                          # against the closure-sized query set (the
                          # q_sim_topk shape, join-form)
}


def test_no_row_python_or_cartesian_anywhere(spark, sf_oracle):
    specs = load_all()
    offenders = []
    for name, spec in specs.items():
        df = spec.builder(spark, sf_oracle)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="simple")
        plan = buf.getvalue()
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BatchEvalPython" in plan and name not in ROW_PYTHON_ALLOWED:
            offenders.append((name, "BatchEvalPython"))
        if (
            "BroadcastNestedLoopJoin" in plan
            and name not in BNLJ_ALLOWED
        ):
            offenders.append((name, "BroadcastNestedLoopJoin"))
    assert not offenders, offenders


def test_unconditional_broadcast_hint_census_is_pinned():
    """Tripwire for the ADVICE-r9 defect class: a bare ``F.broadcast``
    hint on a fact-scaled input bypasses AQE's size thresholds and
    OOMs executors at the 100 TB design point. Every bare hint in the
    package was audited in round 10 — the survivors build on
    fixed-size dims (nation/region, event-type enums), bounded
    aggregates (1-row scalars, per-type sizes, calendar spines,
    hot-bucket caps, |partitions|-row offset spines), or documented
    KB-scale probe sets; fact-scaled inputs must ride
    ``tables.broadcast_if_small`` instead. This census pins the
    audited per-file CODE-SITE counts (docstrings excluded): adding a
    new bare hint fails here and forces the author to either justify
    the bounded-build argument and re-pin, or use the gate.
    """
    import ast
    from pathlib import Path

    pkg = Path(__file__).resolve().parents[1] / "streamclient_spark"
    audited = {
        "functions/dedup.py": 2,
        "functions/embeddings.py": 3,
        "functions/pipeline_ops.py": 9,
        "functions/similarity.py": 3,
        "functions/text.py": 6,
        "operators/reference.py": 2,
        # 52 → 51 in r10: the rolling-WAU interval-delta rewrite
        # deleted its win×broadcast(mx) filter site; 51 → 50 in r11:
        # q_part_abc_xyz fused its span+total broadcasts into one
        # consts aggregate (one crossJoin×broadcast site deleted);
        # 50 → 48 in r12: the sampler-free ranked layout folded the
        # scorecard n1 crossJoin and the migration bounds join into
        # layout literals (window.py 14 → 13: rfm's n_total crossJoin,
        # scale.py 3 → 2: ranked_by_range's offsets broadcast join —
        # same change)
        "operators/relational.py": 48,
        "operators/window.py": 13,
        "scale.py": 2,
        "streaming/joins.py": 1,
        # the size-gate itself (bare-import spelling): the one place a
        # hint may touch a non-fixed-size input, because it is gated
        "tables.py": 1,
    }
    found: dict[str, int] = {}
    for p in sorted(pkg.rglob("*.py")):
        # count real CALL NODES via ast (ADVICE r10: the old regex
        # stripped '"""' strings and '#' comments textually, so a
        # "'''"-docstring — or code the non-greedy pattern paired
        # between two module-level string literals — escaped the
        # census; the syntax tree cannot be fooled by literals)
        n = sum(
            1
            for node in ast.walk(ast.parse(p.read_text()))
            if isinstance(node, ast.Call)
            and (
                (
                    isinstance(node.func, ast.Attribute)
                    and node.func.attr == "broadcast"
                    and isinstance(node.func.value, ast.Name)
                    and node.func.value.id == "F"
                )
                or (
                    # the bare-import spelling, so a new hint can't
                    # dodge the census via `from ... import broadcast`
                    isinstance(node.func, ast.Name)
                    and node.func.id == "broadcast"
                )
            )
        )
        if n:
            found[str(p.relative_to(pkg))] = n
    assert found == audited, (
        "bare F.broadcast( census changed — audit the new/removed "
        f"site(s) and re-pin: {found} != {audited}"
    )
