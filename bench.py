"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

from streamclient_spark.plans.registry import load_all
from streamclient_spark.session import get_spark

# Headline set: reference surface + the heavier relational/LLM ops.
HEADLINE = [
    "q_state_open",
    "q_scan_events",
    "q_filter_type",
    "q_project_rename",
    "q_ttl_filter",
    "q_count_where",
    "q_metric_last_ts",
]


#: Spark-side session-health canary (VERDICT r9 #1 — the mirror of
#: bench_ratio.py's oracle canary): a fixed, fixture-independent
#: pure-CPU probe plan (xxhash64 over a generated range → 1-row agg,
#: exercising codegen, 64 scheduled tasks, and one exchange) timed
#: before and after the timed pass. The r9 committed artifact was
#: ~14% session-inflated across UNTOUCHED queries (median per-query
#: r9/r8 ratio 1.14) with nothing in the artifact to say so; this
#: stamp makes a degraded Spark session machine-visible. xxhash64 was
#: chosen over sha2 because its codegen reaches C2 steady state after
#: ONE discarded run (measured series 1.13 → 0.26±0.03 s; sha2 needs
#: ~8 runs) — the canary must measure the box, not the compiler.
#: Reference: quiet-box min-of-3 after the discard run (pinned r10,
#: this box). Degraded = slowest of the two stamped probes > 2× ref.
SPARK_PROBE_REF_S = 0.25


def spark_probe_s(spark) -> float:
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 5_000_000, 1, 64)
            .select(F.xxhash64("id").alias("x"))
            .agg(F.sum(F.col("x") % 997), F.count("*"))
            .write.format("noop").mode("overwrite").save()
        )
        return time.perf_counter() - t0

    once()  # discard the C2-compile run; the probe measures the box
    return min(once() for _ in range(3))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("streamclient-spark-bench")
    specs = load_all()
    names = [n for n in HEADLINE if n in specs]
    # also time every other registered query (coverage beyond headline)
    names += [n for n in sorted(specs) if n not in names]

    # warm the JVM + parquet footer caches with one cheap action
    specs[names[0]].builder(spark, sf_dir).count()

    probe_before = spark_probe_s(spark)

    # ONE warmup policy for all queries (VERDICT r9 #2 / ADVICE r9 —
    # the r9 head-only untimed warmup made window numbers warm while
    # the tail paid first-run JIT): no untimed warmups at all; every
    # query is timed cold once, and any first run above the 1.5 s
    # floor — JIT-inflated, stall-inflated, or genuinely slow — gets
    # an IMMEDIATE re-run with the min reported (the steady-state
    # number a warm cluster would see), plus one bounded third run
    # while the readings still disagree >1.33× (C2 visibly mid-climb
    # — the bench_ratio.py min-of-2/3 escalation, applied here).
    # Immediate adjacency matters: the r9 shape re-ran at session END,
    # where 250 s of accumulated heap/GC state inflated the retry.
    # Identical escalation for position 1 and position 295, so
    # per-query numbers are position-independent; sub-floor first
    # runs keep at most ~1 s of one-time JIT, bounded by the floor
    # itself. The artifact is self-describing: rerun names ship in
    # the payload.
    trace = os.environ.get("SPARK_GRAFT_BENCH_TRACE")

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        if trace:
            with open(trace, "a") as f:
                f.write(f"{time.time():.0f} {name} {dt:.2f}\n")
        return dt

    timings: dict[str, float] = {}
    reruns: list[str] = []
    for name in names:
        t1 = run_once(name)
        if t1 > 1.5:
            reruns.append(name)
            t2 = run_once(name)
            best = min(t1, t2)
            if best > 1.5 and max(t1, t2) > 1.33 * best:
                best = min(best, run_once(name))
            t1 = best
        timings[name] = t1
    timings = {n: round(t, 3) for n, t in timings.items()}

    probe_after = spark_probe_s(spark)

    total = round(sum(timings.values()), 3)
    # Keep the output line compact: BENCH_r02.json was truncated by the
    # driver's tail-capture limit because all ~178 per-query times were
    # inlined. Report per-query times only for the driver's 50-entry
    # attestation window (load_all() order); everything else is rolled
    # into tail_total_sec. "value" still covers the full registry.
    window = list(specs)[:50]
    reported = {n: timings[n] for n in window if n in timings}
    tail_total = round(total - sum(reported.values()), 3)
    payload = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": reported,
        "n_queries": len(timings),
        "tail_total_sec": tail_total,
        "sf": sf,
        # session-health canary + self-describing warmup policy
        "spark_probe_s": [round(probe_before, 3), round(probe_after, 3)],
        "spark_probe_ref_s": SPARK_PROBE_REF_S,
        "session_degraded": max(probe_before, probe_after)
        > 2 * SPARK_PROBE_REF_S,
        "warmup_policy": "none+min2_over_1.5s",
        "n_rerun": len(reruns),
        "rerun_in_window": sorted(
            n for n in reruns if n in set(list(specs)[:50])
        ),
    }
    # Last measured sf1 Spark-vs-DuckDB ratio (tools/bench_ratio.py
    # writes this file); embedded so the round artifact carries it.
    ratio_file = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "sf1_ratio.json")
    if os.path.exists(ratio_file):
        try:
            with open(ratio_file) as f:
                payload["sf1_ratio"] = json.load(f)
        except Exception:
            pass
    print(json.dumps(payload, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
