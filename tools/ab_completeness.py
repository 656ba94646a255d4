"""A/B: q_dq_completeness — union of 10 independent single-row
aggregates (current: each table contributes its own partial+final AQE
stage pair, ~20 materialized stages) vs one tagged union of per-row
null-flag projections into a SINGLE groupBy(table) aggregate (one
exchange of |tasks|x|tables| partial rows, two stages total). Same
bytes scanned either way — the question is whether the per-stage fixed
cost of the 10-aggregate plan is the measured wall (the reading is
FLAT from sf0.01 to sf1, so overhead, not scan, dominates).
Run: python tools/ab_completeness.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from streamclient_spark.operators.relational import (
    _COMPLETENESS_COLS,
    q_dq_completeness,
)
from streamclient_spark.session import get_spark
from streamclient_spark.tables import load

MAXC = max(len(c) for c in _COMPLETENESS_COLS.values())


def completeness_current(spark, sf_dir):
    return q_dq_completeness(spark, sf_dir)


def completeness_fused(spark, sf_dir):
    parts = []
    for ti, (t, cols) in enumerate(_COMPLETENESS_COLS.items()):
        src = load(spark, sf_dir, t)
        flags = [
            F.col(c).isNull().cast("long").alias(f"z{i}")
            for i, c in enumerate(cols)
        ] + [
            F.lit(None).cast("long").alias(f"z{i}")
            for i in range(len(cols), MAXC)
        ]
        parts.append(src.select(F.lit(ti).alias("ti"), *flags))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    # left join from a literal table spine so an EMPTY table still
    # reports its columns with n_rows = 0 (the oracle's ungrouped
    # aggregate always yields one row; a bare groupBy would drop it)
    spine = spark.range(len(_COMPLETENESS_COLS)).select(
        F.col("id").cast("int").alias("ti")
    )
    agg = spine.join(
        u.groupBy("ti").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(f"z{i}").alias(f"s{i}") for i in range(MAXC)],
        ),
        "ti",
        "left",
    ).select(
        "ti",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        *[F.col(f"s{i}") for i in range(MAXC)],
    )
    reps = F.array(
        *[
            F.struct(
                F.col("ti").alias("ti"),
                F.lit(i).alias("ci"),
                F.col("n").cast("long").alias("n_rows"),
                F.coalesce(F.col(f"s{i}"), F.lit(0))
                .cast("long")
                .alias("n_null"),
            )
            for i in range(MAXC)
        ]
    )
    names = F.array(
        *[
            F.array(
                *(
                    [F.lit(f"{t}.{c}") for c in cols]
                    + [F.lit(None).cast("string")] * (MAXC - len(cols))
                )
            )
            for t, cols in _COMPLETENESS_COLS.items()
        ]
    )
    return (
        agg.select(F.explode(reps).alias("r"))
        .select(
            F.element_at(
                F.element_at(names, F.col("r.ti") + 1), F.col("r.ci") + 1
            ).alias("column_name"),
            F.col("r.n_rows").alias("n_rows"),
            F.col("r.n_null").alias("n_null"),
        )
        .filter(F.col("column_name").isNotNull())
        .withColumn(
            "null_permille",
            F.expr(
                "CASE WHEN n_rows = 0 THEN 0 "
                "ELSE n_null * 1000 div n_rows END"
            ).cast("long"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-completeness")
    a = completeness_current(spark, sf_dir).orderBy("column_name").collect()
    b = completeness_fused(spark, sf_dir).orderBy("column_name").collect()
    assert a == b, (len(a), len(b), a[:3], b[:3])
    print(f"identical {len(a)} rows", flush=True)
    fns = [
        ("current", completeness_current),
        ("fused", completeness_fused),
    ]
    ts = {label: [] for label, _ in fns}
    for _ in range(reps):
        for label, fn in fns:  # interleaved: box drift hits A and B alike
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts[label].append(time.perf_counter() - t0)
    for label, _ in fns:
        print(label, [round(t, 3) for t in ts[label]], "min", round(min(ts[label]), 3))
    spark.stop()


if __name__ == "__main__":
    main()
