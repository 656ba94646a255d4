"""A/B: q_agg_mad — two independent percentile aggregates (current:
orders scanned+shuffled twice into 5 priority groups) vs one
repartition("o_orderpriority") + localCheckpoint feeding BOTH
percentile passes with zero further exchanges (groupBy on the
partitioning key satisfies its distribution).  Both shapes keep
F.percentile itself — the interpolation must stay bit-identical to
DuckDB's quantile_cont — only the data motion changes.
Run: python tools/ab_mad.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from streamclient_spark.session import get_spark
from streamclient_spark.tables import load


def mad_current(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    med = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("med")
    )
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.min("med").alias("median_price"),
            F.percentile(
                F.abs(F.col("o_totalprice") - F.col("med")), 0.5
            ).alias("mad_price"),
            F.count("*").alias("n_orders"),
        )
    )


def mad_one_exchange(spark, sf_dir):
    o = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .repartition(
            spark.sparkContext.defaultParallelism, "o_orderpriority"
        )
        .localCheckpoint(eager=False)
    )
    med = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("med")
    )
    return (
        o.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.min("med").alias("median_price"),
            F.percentile(
                F.abs(F.col("o_totalprice") - F.col("med")), 0.5
            ).alias("mad_price"),
            F.count("*").alias("n_orders"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-mad")
    a = mad_current(spark, sf_dir).orderBy("o_orderpriority").collect()
    b = mad_one_exchange(spark, sf_dir).orderBy("o_orderpriority").collect()
    assert a == b, (a, b)
    print(f"identical {len(a)} rows", flush=True)
    fns = [
        ("current", mad_current),
        ("one_exchange", mad_one_exchange),
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
