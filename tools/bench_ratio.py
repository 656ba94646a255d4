"""Spark-vs-DuckDB per-query timing at an arbitrary fixture dir.

The per-round bench (bench.py) runs at sf0.1, where most queries sit
on Spark's ~0.15 s job-scheduling floor and per-query ratios measure
overhead, not plan quality (VERDICT r1). This tool produces the
meaningful comparison: generate a bigger fixture with
``tools/make_bigsf.py``, then race every oracle-backed query against
its own DuckDB oracle on the same files.

Brute-force oracles (the dedup family's ground-truth formulations) are
skipped above sf0.1 by default: they are intentionally quadratic
reference implementations — at sf1 the near-dup oracle alone is ~1.25B
pairwise Jaccards. The engine-side queries still run; they just have
nothing fair to race against (their DuckDB twin is the brute force).

Usage:
    python tools/make_bigsf.py /root/testdata/sf0.1 /tmp/sf1 10
    python tools/bench_ratio.py /tmp/sf1 [--md]

Emits one JSON line: {"sf_dir", "spark_total", "duck_total", "ratio",
"queries": {name: {"spark": s, "duck": s, "ratio": r}}}; ``--md`` adds
a markdown table on stderr for BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

#: oracles that are deliberately brute-force ground truths — skipped
#: at big SFs (quadratic by construction, not an engine comparison)
BRUTE_FORCE_ORACLES = {
    "q_dedup_near",
    "q_dedup_cluster",
    "q_dedup_simhash",
    "q_dedup_jaccard",
    "q_dedup_embed",
    "q_dedup_incremental",  # new×corpus brute-force ground truth (218 s at sf1)
    "q_join_spatial",  # brute-force θ-join ground truth (~1e11 pairs at sf1)
    "q_dedup_canonical",  # all-pairs Jaccard + recursive closure oracle
    "q_dedup_source_matrix",  # all-pairs shingle Jaccard (a.doc_id <
    #   b.doc_id) — ~1.25B set intersections at sf1; found the hard
    #   way: the round-4 race spun >1 h inside this one oracle
    "q_sim_topk",  # exact rank over all pairs — linear×queries, keep
}
KEEP_ANYWAY = {"q_sim_topk"}  # linear scans race fairly at any sf

#: oracle-health canary (VERDICT r8 #2): a fixed, fixture-independent
#: pure-CPU DuckDB probe timed before and after the race. The r8 sf1
#: headline (0.37×) was contaminated by a session-level DuckDB
#: slowdown (340→780 s between sessions, reproduced twice — box/page
#: cache state, not code); this stamp makes a degraded oracle session
#: machine-distinguishable from a real win. Reference time measured
#: min-of-3 on a quiet box (see BENCH_NOTES r9); degraded = slowest
#: probe > 2× reference.
ORACLE_PROBE_SQL = (
    "SELECT count(*) AS n, sum(r * 3 % 7) AS s FROM range(20000000) t(r)"
)
ORACLE_PROBE_REF_S = 0.21

#: second probe (r9): the r8/r9 duck slowdowns replicated while the
#: pure-CPU probe stayed healthy, so the canary also times a fixed
#: fixture scan+aggregate (I/O + parquet decode path). Its reference
#: depends on fixture size, so instead of an absolute threshold the
#: artifact stamps before/after and flags a session whose two
#: readings disagree >3× (mid-race state change) — the failure mode
#: an absolute CPU reference cannot see.
ORACLE_IO_PROBE_SQL = (
    "SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS q "
    "FROM read_parquet('{dir}/lineitem.parquet') GROUP BY 1"
)


def oracle_probe_s(sql: str = ORACLE_PROBE_SQL) -> float:
    import duckdb

    con = duckdb.connect()
    try:
        t0 = time.perf_counter()
        con.sql(sql).fetchall()
        return round(time.perf_counter() - t0, 4)
    finally:
        con.close()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    emit_md = "--md" in sys.argv

    sys.path.insert(0, "/root/repo")
    from streamclient_spark.plans.registry import load_all
    from streamclient_spark.session import get_spark
    from tests.oracle import duckdb_con

    probe_before = oracle_probe_s()
    io_probe_before = oracle_probe_s(
        ORACLE_IO_PROBE_SQL.format(dir=sf_dir)
    )

    spark = get_spark("streamclient-spark-bench-ratio")
    specs = load_all()
    skip = BRUTE_FORCE_ORACLES - KEEP_ANYWAY

    # warm JVM / footer caches
    specs["q_scan_events"].builder(spark, sf_dir).count()

    # JVM warmup pass (VERDICT r6 #6): the first ~5 timed queries of
    # every prior race measured ~1.5× worse than steady state — C2
    # compilation of the codegen'd aggregate/join kernels, not plan
    # quality — and window rotation lands exactly the
    # hardest-graded queries (re-attests, audits) at the head. Run
    # the head queries once UNTIMED so the committed detail measures
    # plans, not compiler state.
    warmed = 0
    for name, spec in specs.items():
        if warmed >= 5:
            break
        if spec.oracle is None or name in skip:
            continue  # mirror the timed loop's filter so the warmup
            # covers the first 5 queries that will actually be timed
        try:
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass  # the timed loop will surface any real failure
        warmed += 1

    def run_spark(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # cross-RUN self-check (VERDICT r11 #5, the bench.py device at this
    # sf): any spark reading that finishes >1.5× its committed prior
    # (+150 ms) from tools/sf1_ratio_detail.json earns one more re-race
    # before it is believed; survivors are stamped in over_prior so a
    # contended race is machine-visible in the committed artifact.
    prior_spark: dict[str, float] = {}
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "sf1_ratio_detail.json")) as f:
            prior = json.load(f)
        if prior.get("sf_dir") == sf_dir:
            prior_spark = {
                n: float(r["spark"])
                for n, r in (prior.get("queries") or {}).items()
                if isinstance(r, dict) and r.get("spark")
            }
    except Exception:
        pass

    results: dict[str, dict] = {}
    over_prior: list[str] = []
    for name, spec in specs.items():
        if spec.oracle is None or name in skip:
            continue
        spark_s = run_spark(name)
        if spark_s > 1.0:
            # re-run and keep the min: first runs pay codegen JIT and
            # cross-query contention (see bench.py). Round-8 lesson:
            # q_tpch_q10 measured 3.1 s under min-of-2 but 0.8 s warm
            # steady-state — C2 compilation of new agg kernels can
            # outlast two runs, so escalate to a third while still >1.5 s.
            spark_s = min(spark_s, run_spark(name))
            if spark_s > 1.5:
                spark_s = min(spark_s, run_spark(name))
        p = prior_spark.get(name)
        if p is not None and spark_s > 1.5 * p and spark_s > p + 0.15:
            spark_s = min(spark_s, run_spark(name))
            if spark_s > 1.5 * p and spark_s > p + 0.15:
                over_prior.append(name)

        def run_duck() -> float:
            con = duckdb_con(sf_dir)
            try:
                t0 = time.perf_counter()
                con.sql(spec.oracle).fetchall()
                return time.perf_counter() - t0
            finally:
                con.close()

        duck_s = run_duck()
        if duck_s > 1.0:
            # SYMMETRIC retry policy (r9): Spark above gets min-of-2
            # (escalating to 3) to shed one-shot JIT/contention noise,
            # but duck previously got a single shot — and the r8/r9
            # "session slowdown" turned out to be exactly this: the
            # same oracle measured 7.4 s standalone vs 69 s one-shot
            # mid-race (transient co-tenancy with the JVM, not code
            # or box state — both canary probes stayed healthy).
            # Giving both engines the same min-of-N makes duck_total
            # a steady-state number too.
            duck_s = min(duck_s, run_duck())
            if duck_s > 1.5:
                duck_s = min(duck_s, run_duck())
        results[name] = {
            "spark": round(spark_s, 3),
            "duck": round(duck_s, 3),
            "ratio": round(spark_s / duck_s, 2) if duck_s > 0 else None,
        }
        print(
            f"{name}: spark {spark_s:.2f}s duck {duck_s:.2f}s",
            file=sys.stderr,
            flush=True,
        )

    probe_after = oracle_probe_s()
    io_probe_after = oracle_probe_s(
        ORACLE_IO_PROBE_SQL.format(dir=sf_dir)
    )
    # degraded if EITHER probe is slow (a mid-race slowdown inflates
    # duck_total just as much as a start-of-race one), or the I/O
    # probe's two readings disagree >3× (session state changed)
    io_pair = sorted([io_probe_before, io_probe_after])
    oracle_degraded = (
        max(probe_before, probe_after) > 2 * ORACLE_PROBE_REF_S
        or (io_pair[0] > 0 and io_pair[1] > 3 * io_pair[0])
    )
    spark_total = round(sum(r["spark"] for r in results.values()), 2)
    duck_total = round(sum(r["duck"] for r in results.values()), 2)
    out = {
        "sf_dir": sf_dir,
        "spark_total": spark_total,
        "duck_total": duck_total,
        "ratio": round(spark_total / duck_total, 3),
        "oracle_probe_s": [probe_before, probe_after],
        "oracle_probe_ref_s": ORACLE_PROBE_REF_S,
        "oracle_io_probe_s": [io_probe_before, io_probe_after],
        "oracle_degraded": oracle_degraded,
        "n_over_prior": len(over_prior),
        "over_prior": sorted(over_prior),
        "queries": results,
    }
    print(json.dumps(out))
    # Persist the headline ratio so bench.py can embed it in its
    # one-line payload (the round artifact then carries the sf1 gate
    # evidence even though the driver only runs bench.py).
    summary = {
        "sf_dir": sf_dir,
        "spark_total": spark_total,
        "duck_total": duck_total,
        "ratio": out["ratio"],
        "oracle_probe_s": [probe_before, probe_after],
        "oracle_probe_ref_s": ORACLE_PROBE_REF_S,
        "oracle_io_probe_s": [io_probe_before, io_probe_after],
        "oracle_degraded": oracle_degraded,
        "n_over_prior": len(over_prior),
        "n_queries": len(results),
    }
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "sf1_ratio.json"), "w") as f:
            json.dump(summary, f)
        # the full per-query race table, committed alongside the
        # summary (VERDICT r4 #8: the per-query evidence previously
        # lived in /tmp and died with the box)
        with open(os.path.join(here, "sf1_ratio_detail.json"), "w") as f:
            json.dump(out, f, indent=0, sort_keys=True)
    except OSError:
        pass
    if emit_md:
        print("\n| query | spark s | duckdb s | ratio |", file=sys.stderr)
        print("|---|---|---|---|", file=sys.stderr)
        for name, r in sorted(
            results.items(), key=lambda kv: -kv[1]["spark"]
        ):
            print(
                f"| {name} | {r['spark']} | {r['duck']} | {r['ratio']} |",
                file=sys.stderr,
            )
        print(
            f"| **total** | **{spark_total}** | **{duck_total}** | "
            f"**{out['ratio']}** |",
            file=sys.stderr,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
