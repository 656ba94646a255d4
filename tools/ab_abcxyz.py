"""A/B: q_part_abc_xyz — `span` and `tot` as two separate 1-row
aggregates off the checkpointed parts spine (current: two broadcast
build jobs, each a full pass over |parts|) vs ONE fused 1-row
aggregate carrying (n_weeks, total) that both downstream crossJoins
broadcast (one pass, one build job).
Run: python tools/ab_abcxyz.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from streamclient_spark.operators.relational import q_part_abc_xyz
from streamclient_spark.scale import running_sum_by_range
from streamclient_spark.session import get_spark
from streamclient_spark.tables import load


def abc_current(spark, sf_dir):
    return q_part_abc_xyz(spark, sf_dir)


def abc_fused(spark, sf_dir):
    wk_expr = (
        "CAST(datediff(to_date(l_shipdate), DATE '1970-01-01')"
        " AS BIGINT) div 7"
    )
    pp = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("partkey"),
            F.expr(wk_expr).alias("wk"),
            F.round(F.col("l_quantity") * 100).cast("bigint").alias("qc"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("bigint")
            .alias("rc"),
        )
        .repartition(spark.sparkContext.defaultParallelism, "partkey")
        .groupBy("partkey", "wk")
        .agg(F.sum("qc").alias("q"), F.sum("rc").alias("r"))
        .groupBy("partkey")
        .agg(
            F.sum("q").alias("sx"),
            F.sum(F.col("q") * F.col("q")).alias("sxx"),
            F.sum("r").alias("revenue"),
            F.min("wk").alias("minwk"),
            F.max("wk").alias("maxwk"),
        )
        .localCheckpoint(eager=False)
    )
    consts = pp.agg(
        (F.max("maxwk") - F.min("minwk") + 1).alias("n_weeks"),
        F.sum("revenue").alias("total"),
    )
    cum = running_sum_by_range(
        pp,
        [F.desc("revenue"), F.asc("partkey")],
        "revenue",
        out_col="cum",
    )
    num = F.col("n_weeks") * F.col("sxx") - F.col("sx") * F.col("sx")
    classed = cum.crossJoin(F.broadcast(consts)).select(
        "revenue",
        "total",
        F.when(F.col("cum") * 10 <= F.col("total") * 8, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
        .alias("cls_abc"),
        F.when(4 * num <= F.col("sx") * F.col("sx"), "X")
        .when(num <= F.col("sx") * F.col("sx"), "Y")
        .otherwise("Z")
        .alias("cls_xyz"),
    )
    return (
        classed.groupBy("cls_abc", "cls_xyz", "total")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("revenue").alias("_rev"),
        )
        .select(
            "cls_abc",
            "cls_xyz",
            "n_parts",
            F.expr("_rev * 1000 div total")
            .cast("long")
            .alias("revenue_share_permille"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-abcxyz")
    a = abc_current(spark, sf_dir).orderBy("cls_abc", "cls_xyz").collect()
    b = abc_fused(spark, sf_dir).orderBy("cls_abc", "cls_xyz").collect()
    assert a == b, (a, b)
    print(f"identical {len(a)} rows", flush=True)
    fns = [("current", abc_current), ("fused", abc_fused)]
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
