"""Race a handful of named queries against their DuckDB oracles at an
arbitrary fixture dir — the single-query companion of bench_ratio.py
for iterating on one weak-list entry without a 15-minute full race.

Usage:
    python tools/race_one.py /tmp/sf1 q_part_abc_xyz [q_other ...] [--runs N]
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    # Accept both ``--runs=N`` and ``--runs N`` (the usage line shows the
    # space form; the = form is what bench notes historically used).
    argv = sys.argv[1:]
    runs = 3
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            try:
                if "=" in a:
                    runs = int(a.split("=", 1)[1])
                else:
                    i += 1
                    if i >= len(argv):
                        raise ValueError("--runs requires a value")
                    runs = int(argv[i])
            except ValueError as exc:
                print(f"error: {exc}\n{__doc__}", file=sys.stderr)
                return 2
        elif a.startswith("--"):
            # Unknown flags must not leak into positionals (a typo like
            # ``--run=6`` would otherwise become sf_dir or a query name).
            print(f"error: unrecognized flag {a!r}\n{__doc__}", file=sys.stderr)
            return 2
        else:
            args.append(a)
        i += 1
    if len(args) < 2:
        print(f"error: need sf_dir and at least one query\n{__doc__}",
              file=sys.stderr)
        return 2
    sf_dir, names = args[0], args[1:]

    sys.path.insert(0, "/root/repo")
    from streamclient_spark.plans.registry import load_all
    from streamclient_spark.session import get_spark
    from tests.oracle import duckdb_con

    spark = get_spark("streamclient-spark-race-one")
    specs = load_all()
    specs["q_scan_events"].builder(spark, sf_dir).count()  # warm JVM

    for name in names:
        spec = specs[name]
        spark_best = min(
            _timed(lambda: spec.builder(spark, sf_dir)
                   .write.format("noop").mode("overwrite").save())
            for _ in range(runs)
        )
        duck_best = None
        if spec.oracle is not None:
            for _ in range(runs):
                con = duckdb_con(sf_dir)
                try:
                    t = _timed(lambda: con.sql(spec.oracle).fetchall())
                finally:
                    con.close()
                duck_best = t if duck_best is None else min(duck_best, t)
        ratio = (
            f"{spark_best / duck_best:.2f}x" if duck_best else "no-oracle"
        )
        print(
            f"{name}: spark {spark_best:.2f}s duck "
            f"{duck_best if duck_best is None else round(duck_best, 2)}s "
            f"ratio {ratio}",
            flush=True,
        )
    return 0


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())
