"""A/B: q_table_diff — full-outer SMJ of the two snapshot derivations
(current: two orderkey sort+shuffles) vs the stacked-pivot device
(q_customer_migration's lesson): the key is unique within each
snapshot, so a tag-union + one groupBy(key) max-when pivot IS the full
outer join — one hash exchange, no sorts.
Run: python tools/ab_tablediff.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from streamclient_spark.session import get_spark
from streamclient_spark.tables import load


def _snapshots(spark, sf_dir):
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = o.filter(F.col("o_orderkey") % 10 != 0)
    new = o.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 7 == 0,
            F.round(F.col("o_totalprice") + 1.0, 2),
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return old, new


def _delta_filter(j):
    return j.filter(
        F.col("old_key").isNull()
        | F.col("new_key").isNull()
        | (F.col("old_status") != F.col("new_status"))
        | (F.col("old_price") != F.col("new_price"))
    ).select(
        F.coalesce(F.col("old_key"), F.col("new_key")).alias("o_orderkey"),
        F.when(F.col("old_key").isNull(), "added")
        .when(F.col("new_key").isNull(), "removed")
        .otherwise("changed")
        .alias("change"),
        F.col("old_price").alias("old_price"),
        F.col("new_price").alias("new_price"),
    )


def diff_current(spark, sf_dir):
    old, new = _snapshots(spark, sf_dir)
    j = old.alias("old").join(
        new.alias("new"),
        F.col("old.o_orderkey") == F.col("new.o_orderkey"),
        "full",
    ).select(
        F.col("old.o_orderkey").alias("old_key"),
        F.col("old.o_orderstatus").alias("old_status"),
        F.col("old.o_totalprice").alias("old_price"),
        F.col("new.o_orderkey").alias("new_key"),
        F.col("new.o_orderstatus").alias("new_status"),
        F.col("new.o_totalprice").alias("new_price"),
    )
    return _delta_filter(j)


def diff_pivot(spark, sf_dir):
    old, new = _snapshots(spark, sf_dir)
    stacked = old.select(
        "o_orderkey", F.lit(0).alias("t"), "o_orderstatus", "o_totalprice"
    ).unionAll(
        new.select(
            "o_orderkey",
            F.lit(1).alias("t"),
            "o_orderstatus",
            "o_totalprice",
        )
    )
    t0 = F.col("t") == 0
    j = stacked.groupBy("o_orderkey").agg(
        F.max(F.when(t0, F.col("o_orderkey"))).alias("old_key"),
        F.max(F.when(t0, F.col("o_orderstatus"))).alias("old_status"),
        F.max(F.when(t0, F.col("o_totalprice"))).alias("old_price"),
        F.max(F.when(~t0, F.col("o_orderkey"))).alias("new_key"),
        F.max(F.when(~t0, F.col("o_orderstatus"))).alias("new_status"),
        F.max(F.when(~t0, F.col("o_totalprice"))).alias("new_price"),
    )
    return _delta_filter(j)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-tablediff")
    a = diff_current(spark, sf_dir).orderBy("o_orderkey", "change").collect()
    b = diff_pivot(spark, sf_dir).orderBy("o_orderkey", "change").collect()
    assert a == b, (len(a), len(b), a[:3], b[:3])
    print(f"identical {len(a)} rows", flush=True)
    fns = [("current", diff_current), ("pivot", diff_pivot)]
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
