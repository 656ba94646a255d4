"""Split per-query wall time into DataFrame CONSTRUCTION (builder call:
Py4J round-trips, driver-side analysis, eager jobs inside iterative
kernels) vs EXECUTION (noop-sink save) — the round-11 measurement that
exposed the ~105 s build-time class (guide §7.3, driver-side work).

Run: python tools/profile_build_exec.py <sf_dir> <query> [<query>...]
         [--runs N]

Each query runs N times in one session (bench-like: shared JVM, shared
keyed caches); per run the builder wall and the exec wall are printed,
plus the min-of-runs summary line per query.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    argv = sys.argv[1:]
    runs = 3
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            if "=" in a:
                runs = int(a.split("=", 1)[1])
            else:
                i += 1
                runs = int(argv[i])
        else:
            args.append(a)
        i += 1
    if len(args) < 2:
        print(f"error: need sf_dir and >=1 query\n{__doc__}", file=sys.stderr)
        return 2
    sf_dir, names = args[0], args[1:]

    sys.path.insert(0, "/root/repo")
    from streamclient_spark.plans.registry import load_all
    from streamclient_spark.session import get_spark

    spark = get_spark("streamclient-spark-profile-build-exec")
    specs = load_all()
    specs["q_scan_events"].builder(spark, sf_dir).count()  # warm JVM

    summary: dict[str, tuple[float, float]] = {}
    for name in names:
        spec = specs[name]
        best_b, best_e = float("inf"), float("inf")
        for r in range(runs):
            t0 = time.perf_counter()
            df = spec.builder(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            b, e = t1 - t0, t2 - t1
            best_b, best_e = min(best_b, b), min(best_e, e)
            print(f"  {name} run{r}: build {b:.3f}s exec {e:.3f}s", flush=True)
        summary[name] = (best_b, best_e)
        print(
            f"{name}: build {best_b:.3f}s exec {best_e:.3f}s "
            f"total {best_b + best_e:.3f}s (min-of-{runs})",
            flush=True,
        )
    print("--- summary (min per phase) ---")
    for name, (b, e) in summary.items():
        print(f"{name}: build {b:.3f}s exec {e:.3f}s total {b + e:.3f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
