"""Registry-wide sf10 scale sweep (VERDICT r8 #5): pin the 100×-scale
claim for the heaviest queries with measured numbers, not per-rewrite
anecdotes.

Picks the top-N queries by sf1 Spark wall from the committed race
detail (``tools/sf1_ratio_detail.json``), runs each at sf1 and sf10
warm (min over ``--runs``, after one untimed warmup of the first few),
and reports the sf10/sf1 scale factor. The fixtures are FK-consistent
replications (``tools/make_bigsf.py``), so row counts scale ×10 and a
healthy scan/join/agg plan should scale ≤~linearly; anything clearly
super-linear is a plan that would not survive 100× and becomes a
round item.

Usage:
    python tools/sweep_sf10.py [--top N] [--runs K] [--sf1 DIR] [--sf10 DIR]

Emits one JSON line {"queries": {name: {"sf1": s, "sf10": s,
"scale": x}}} and a markdown table on stderr for BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--sf10", default="/tmp/sf10")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from streamclient_spark.plans.registry import load_all
    from streamclient_spark.session import get_spark

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "sf1_ratio_detail.json")) as f:
        detail = json.load(f)
    ranked = sorted(
        detail["queries"].items(), key=lambda kv: -kv[1]["spark"]
    )
    names = [name for name, _ in ranked[: args.top]]

    spark = get_spark("streamclient-spark-sf10-sweep")
    specs = load_all()

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        specs[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # one untimed pass over the head queries at each sf so C2
    # compilation of the shared kernels is paid before timing
    for sf_dir in (args.sf1, args.sf10):
        specs["q_scan_events"].builder(spark, sf_dir).count()
        for name in names[:3]:
            try:
                run(name, sf_dir)
            except Exception:
                pass

    out: dict[str, dict] = {}
    for name in names:
        s1 = min(run(name, args.sf1) for _ in range(args.runs))
        s10 = min(run(name, args.sf10) for _ in range(args.runs))
        scale = round(s10 / s1, 2) if s1 > 0 else None
        out[name] = {
            "sf1": round(s1, 2),
            "sf10": round(s10, 2),
            "scale": scale,
        }
        print(
            f"{name}: sf1 {s1:.2f}s sf10 {s10:.2f}s "
            f"scale {scale if scale is not None else 'n/a'}x",
            file=sys.stderr,
            flush=True,
        )

    print(json.dumps({"runs": args.runs, "queries": out}))
    print("\n| query | sf1 s | sf10 s | scale | ", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for name, r in sorted(
        out.items(), key=lambda kv: -(kv[1]["scale"] or 0)
    ):
        print(
            f"| {name} | {r['sf1']} | {r['sf10']} | {r['scale']}x |",
            file=sys.stderr,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
