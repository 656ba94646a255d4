"""A/B: q_events_rfm — three ranked_by_range passes (current) vs one
stacked-axis rank pass (VERDICT r10 #4). Run on a quiet box:

    python tools/ab_rfm.py /root/testdata/sf0.1 [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from streamclient_spark.scale import ntile_from_rank, ranked_by_range
from streamclient_spark.session import get_spark
from streamclient_spark.tables import load


def base(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("w"))
    u = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )
    return (
        u.join(F.broadcast(wm))
        .select(
            "user_id",
            F.datediff("w", "last_ts").cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
        .localCheckpoint(eager=False)
    )


def finish(s):
    seg = (
        F.when((F.col("r") <= 2) & (F.col("f") <= 2), "core")
        .when(F.col("r") <= 2, "recent")
        .when(F.col("f") <= 2, "lapsing-heavy")
        .otherwise("tail")
    )
    return s.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r",
        "f",
        "m",
        seg.alias("segment"),
    )


def rfm_current(spark, sf_dir):
    u = base(spark, sf_dir)
    n_total = u.agg(F.count(F.lit(1)).alias("__N"))

    def quintile(value, desc, out):
        key = u.select(
            "user_id",
            (-F.col(value) if desc else F.col(value)).alias("__k"),
        )
        rk = ranked_by_range(key, ["__k", "user_id"], rank_col="__rn")
        return rk.join(F.broadcast(n_total)).select(
            "user_id",
            ntile_from_rank(F.col("__rn"), F.col("__N"), 5).alias(out),
        )

    s = (
        u.join(quintile("recency_days", False, "r"), "user_id")
        .join(quintile("frequency", True, "f"), "user_id")
        .join(quintile("monetary_cents", True, "m"), "user_id")
    )
    return finish(s)


def rfm_stacked(spark, sf_dir):
    u = base(spark, sf_dir)
    n_total = u.agg(F.count(F.lit(1)).alias("__N"))
    stacked = u.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("long").alias("__axis"),
                    F.col("recency_days").alias("__k"),
                ),
                F.struct(
                    F.lit(1).cast("long").alias("__axis"),
                    (-F.col("frequency")).cast("long").alias("__k"),
                ),
                F.struct(
                    F.lit(2).cast("long").alias("__axis"),
                    (-F.col("monetary_cents")).alias("__k"),
                ),
            )
        ).alias("s"),
    ).select("user_id", "s.__axis", "s.__k")
    rk = ranked_by_range(
        stacked, ["__axis", "__k", "user_id"], rank_col="__g"
    )
    per = rk.join(F.broadcast(n_total)).select(
        "user_id",
        "__axis",
        ntile_from_rank(
            F.col("__g") - F.col("__axis") * F.col("__N"), F.col("__N"), 5
        ).alias("__q"),
    )
    quint = per.groupBy("user_id").agg(
        F.max(F.when(F.col("__axis") == 0, F.col("__q"))).alias("r"),
        F.max(F.when(F.col("__axis") == 1, F.col("__q"))).alias("f"),
        F.max(F.when(F.col("__axis") == 2, F.col("__q"))).alias("m"),
    )
    s = u.join(quint, "user_id")
    return finish(s)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-rfm")

    # identity check first
    a = rfm_current(spark, sf_dir).orderBy("user_id").collect()
    b = rfm_stacked(spark, sf_dir).orderBy("user_id").collect()
    assert a == b, "MISMATCH"
    print(f"identical results over {len(a)} users", flush=True)

    for label, fn in [("current", rfm_current), ("stacked", rfm_stacked)]:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(label, [round(t, 3) for t in ts], "min", round(min(ts), 3))
    spark.stop()


if __name__ == "__main__":
    main()
