"""A/B: q_customer_migration — full-outer self-join of the two period
slices (current) vs one groupBy(cust) pivot (VERDICT r10 #5; the RFM
stacked-pivot device). Run: python tools/ab_migration.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from streamclient_spark.scale import ranked_by_range
from streamclient_spark.session import get_spark
from streamclient_spark.tables import load

SPLIT = 1998


def seg_table(spark, sf_dir):
    cp = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust"),
            F.when(F.year(F.to_date("o_orderdate")) < SPLIT, F.lit(0))
            .otherwise(F.lit(1))
            .alias("p"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("rc"),
        )
        .groupBy("cust", "p")
        .agg(F.sum("rc").alias("rc"))
    )
    ranked = ranked_by_range(
        cp, ["p", F.desc("rc"), F.asc("cust")], rank_col="grk",
        group_col="p",  # r12: the sampler-free per-period layout
    )
    bounds = ranked.groupBy(F.col("p").alias("p0")).agg(
        F.min("grk").alias("r0"), F.count(F.lit(1)).alias("np")
    )
    return ranked.join(F.broadcast(bounds), F.col("p") == F.col("p0")).select(
        "cust", "p", F.expr("(grk - r0) * 3 div np").cast("long").alias("s")
    )


def mig_current(spark, sf_dir):
    seg = seg_table(spark, sf_dir).localCheckpoint(eager=False)
    a = seg.filter(F.col("p") == 0).select("cust", F.col("s").alias("sa"))
    b = seg.filter(F.col("p") == 1).select("cust", F.col("s").alias("sb"))
    return (
        a.join(b, "cust", "full_outer")
        .groupBy(
            F.coalesce(F.col("sa"), F.lit(-1)).alias("seg_p1"),
            F.coalesce(F.col("sb"), F.lit(-1)).alias("seg_p2"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


def mig_pivot(spark, sf_dir):
    seg = seg_table(spark, sf_dir)
    return (
        seg.groupBy("cust")
        .agg(
            F.max(F.when(F.col("p") == 0, F.col("s"))).alias("sa"),
            F.max(F.when(F.col("p") == 1, F.col("s"))).alias("sb"),
        )
        .groupBy(
            F.coalesce(F.col("sa"), F.lit(-1)).alias("seg_p1"),
            F.coalesce(F.col("sb"), F.lit(-1)).alias("seg_p2"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-migration")
    a = mig_current(spark, sf_dir).orderBy("seg_p1", "seg_p2").collect()
    b = mig_pivot(spark, sf_dir).orderBy("seg_p1", "seg_p2").collect()
    assert a == b, (a, b)
    print(f"identical {len(a)} cells", flush=True)
    arms = [("join", mig_current), ("pivot", mig_pivot)]
    ts = {label: [] for label, _ in arms}
    for _ in range(reps):  # interleaved so host drift hits both alike
        for label, fn in arms:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts[label].append(time.perf_counter() - t0)
    import statistics

    for label, _ in arms:
        xs = ts[label]
        print(label, [round(t, 3) for t in xs], "min", round(min(xs), 3),
              "med", round(statistics.median(xs), 3))
    spark.stop()


if __name__ == "__main__":
    main()
