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
#: The pin is HOST-RELATIVE (ADVICE r10): on any other machine set
#: SPARK_GRAFT_PROBE_REF_S to that box's quiet min-of-3, or treat
#: session_degraded as meaningless; the artifact records provenance.
#: The canary catches stalls (>2× episodes), not uniform 5-10% drift —
#: cross_round_median_ratio below is the arbiter for drift.
SPARK_PROBE_REF_S = float(os.environ.get("SPARK_GRAFT_PROBE_REF_S", "0.25"))


def prior_per_query(
    repo_dir: str, sf: float, cpus: int | None = None
) -> tuple[dict, dict, str]:
    """Committed per-query history from BENCH_r*.json artifacts at the
    same sf (VERDICT r10 #2/#6). Returns (latest-wins map over ALL
    artifacts — the self-check baseline, every query has a committed
    value because the attestation windows rotate through the whole
    registry; the single newest artifact's window — the cross-round
    median base; that artifact's name). Missing/foreign-sf artifacts
    contribute nothing — a fresh checkout or a different sf runs with
    the self-check inert, never wrong. With ``cpus``, a committed
    per-(cpus, sf) sidecar (see main()) takes final precedence — the
    freshest same-config measurement."""
    import glob
    import re

    merged: dict[str, float] = {}
    newest: dict[str, float] = {}
    newest_name = ""

    def round_no(path: str) -> int:
        m = re.search(r"r(\d+)", os.path.basename(path))
        return int(m.group(1)) if m else -1

    for path in sorted(
        glob.glob(os.path.join(repo_dir, "BENCH_r*.json")), key=round_no
    ):
        try:
            with open(path) as f:
                raw = json.load(f)
            # driver artifacts wrap the bench line in a "tail" string
            line = (
                raw["tail"].strip().splitlines()[-1]
                if isinstance(raw.get("tail"), str)
                else None
            )
            try:
                payload = json.loads(line) if line is not None else raw
            except ValueError:
                # the driver's tail capture can truncate the line's
                # HEAD (BENCH_r10.json ships without its opening
                # '{"metric'); the flat per-query map and the
                # top-level sf are still recoverable verbatim
                qm = re.search(r'"queries":(\{[^{}]*\})', line)
                sfm = re.search(r'"sf":([0-9.eE+-]+)', line)
                if not (qm and sfm):
                    continue
                payload = {
                    "queries": json.loads(qm.group(1)),
                    "sf": float(sfm.group(1)),
                }
        except Exception:
            continue
        if abs(float(payload.get("sf", -1)) - sf) > 1e-9:
            continue
        qs = payload.get("queries") or {}
        qs = {
            str(k): float(v)
            for k, v in qs.items()
            if isinstance(v, (int, float)) and v > 0
        }
        if qs:
            merged.update(qs)
            newest, newest_name = qs, os.path.basename(path)
    # committed sidecars carry the FULL registry map (the printed line
    # holds only the 50-query window under the driver's 2000-byte tail
    # budget) — freshest baseline, latest-wins over the window-only
    # artifact maps. Read the legacy single-slot file first, then the
    # per-(cpus, sf) slot (VERDICT r11 #1/#4: the single slot was
    # overwritten by every run, so an 8-core driver pass destroyed the
    # 32-core run's audit trail; per-config slots coexist and the
    # same-config one wins the baseline).
    candidates = [os.path.join(repo_dir, "tools", "bench_last_detail.json")]
    if cpus is not None:
        candidates.append(
            os.path.join(repo_dir, "tools", _detail_name(cpus, sf))
        )
    for path in candidates:
        try:
            with open(path) as f:
                det = json.load(f)
            if abs(float(det.get("sf", -1)) - sf) > 1e-9:
                continue
            qs = {
                str(k): float(v)
                for k, v in (det.get("queries_all") or {}).items()
                if isinstance(v, (int, float)) and v > 0
            }
            if qs:
                merged.update(qs)
        except Exception:
            continue
    return merged, newest, newest_name


def _detail_name(cpus: int, sf: float) -> str:
    """Per-config sidecar filename: one slot per (cpus, sf), so runs at
    different configurations never clobber each other's full map."""
    return f"bench_detail_c{cpus}_sf{sf:g}.json"


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


def _median_ratio(timings: dict, prior: dict) -> float | None:
    import statistics

    ratios = [
        timings[n] / v for n, v in prior.items() if n in timings and v > 0
    ]
    return round(statistics.median(ratios), 3) if ratios else None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
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

    # Cross-round per-query self-check (VERDICT r10 #2): a sub-floor
    # query timed ONCE cold can commit a single C2-cold/busy-window
    # reading with no rerun (q_join_asof_tolerance r10: 1.083 s vs a
    # 0.58-0.64 history, no code change). Any cold reading above 1.5×
    # the query's last committed value — at the same sf — earns an
    # immediate rerun even below the 1.5 s floor; the min is the
    # steady-state number a warm cluster would see.
    prior_all, prior_newest, prior_ref = prior_per_query(
        os.path.dirname(os.path.abspath(__file__)), sf, cpus
    )

    timings: dict[str, float] = {}
    reruns: list[str] = []
    selfcheck_reruns: list[str] = []
    for name in names:
        t1 = run_once(name)
        p = prior_all.get(name)
        if t1 > 1.5:
            reruns.append(name)
            t2 = run_once(name)
            best = min(t1, t2)
            if best > 1.5 and max(t1, t2) > 1.33 * best:
                best = min(best, run_once(name))
            t1 = best
            # the floor path used to SKIP the prior comparison, so a
            # query whose escalated min was still far above its
            # committed history (a contended session: the first r11
            # run read q_text_chunker at 4.7 s vs 0.42 committed,
            # stable across the min-of-2, started too close to a
            # 15-min pytest JVM teardown) sailed through unmarked —
            # one more race plus membership in selfcheck_rerun makes
            # the excursion machine-visible either way
            if p is not None and t1 > 1.5 * p and t1 > p + 0.15:
                selfcheck_reruns.append(name)
                t1 = min(t1, run_once(name))
        elif p is not None and t1 > 1.5 * p and t1 > p + 0.15:
            # the absolute guard keeps tens-of-ms jitter on fast
            # queries from tripping the ratio (first run: 44 of 50
            # window queries re-raced on noise); a real excursion —
            # the asof case was prior+0.5 s — clears 150 ms easily
            reruns.append(name)
            selfcheck_reruns.append(name)
            t1 = min(t1, run_once(name))
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
        "cpus": cpus,
        # session-health canary + self-describing warmup policy
        "spark_probe_s": [round(probe_before, 3), round(probe_after, 3)],
        "spark_probe_ref_s": SPARK_PROBE_REF_S,
        "session_degraded": max(probe_before, probe_after)
        > 2 * SPARK_PROBE_REF_S,
        "warmup_policy": "none+min2_over_1.5s+selfcheck_1.5x_prior",
        "n_rerun": len(reruns),
        # readings that FINISHED above 1.5× their committed prior
        # (+150 ms) even after every rerun: >0 means this artifact
        # carries values a quiet box has beaten before — re-race
        # before believing a regression (names in the sidecar)
        "n_over_prior": sum(
            1
            for n, t in timings.items()
            if n in prior_all
            and t > 1.5 * prior_all[n]
            and t > prior_all[n] + 0.15
        ),
        # cross-round drift arbiter (VERDICT r10 #6): median of
        # this-run/prior-committed over the newest same-sf artifact's
        # window — uniform session drift (which the 2× probe canary
        # cannot see) is machine-readable here; ~1.0 on a quiet box
        "cross_round_ref": prior_ref or None,
        "cross_round_median_ratio": _median_ratio(timings, prior_newest),
        # full per-query map + rerun/self-check name lists + probe-ref
        # provenance live in the committed sidecar: the driver's tail
        # capture keeps only the LAST 2000 bytes of output (measured —
        # BENCH_r10.json shipped head-truncated, its opening
        # '{"metric' cut), so the printed line stays under that budget
        # and everything bigger goes to the file the round commit
        # carries. One sidecar slot per (cpus, sf): the driver's 8-core
        # scaling pass no longer overwrites the 32-core run's audit
        # trail (VERDICT r11 #1/#4).
        "detail": f"tools/{_detail_name(cpus, sf)}",
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
    detail = dict(payload)
    detail.update(
        {
            "queries_all": timings,
            "over_prior": sorted(
                n
                for n, t in timings.items()
                if n in prior_all
                and t > 1.5 * prior_all[n]
                and t > prior_all[n] + 0.15
            ),
            "rerun": sorted(reruns),
            "rerun_in_window": sorted(
                n for n in reruns if n in set(window)
            ),
            "selfcheck_rerun": sorted(selfcheck_reruns),
            "spark_probe_ref_provenance": os.environ.get(
                "SPARK_GRAFT_PROBE_REF_S",
                "pinned: round-driver box quiet min-of-3 (r10); "
                "override SPARK_GRAFT_PROBE_REF_S off-box",
            ),
        }
    )
    try:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tools",
            _detail_name(cpus, sf),
        )
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: the printed line still stands alone
    # Fit the line to the driver's 2000-byte tail budget: trim the
    # inline per-query map from the BACK of the window (the head of
    # the window is this round's evidentiary lead and stays inline;
    # every trimmed entry still ships in the sidecar), keeping
    # tail_total_sec = value − sum(inline) consistent throughout.
    line = json.dumps(payload, separators=(",", ":"))
    names_in = list(payload["queries"])
    while len(line) > 1900 and names_in:
        payload["queries"].pop(names_in.pop())
        payload["tail_total_sec"] = round(
            total - sum(payload["queries"].values()), 3
        )
        payload["n_inline"] = len(names_in)
        line = json.dumps(payload, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
