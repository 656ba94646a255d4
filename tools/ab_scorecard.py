"""A/B: q_supplier_scorecard — current (union slices + score groupBy +
join back to m) vs explode-stack + value-carrying pivot (no join back).
Run: python tools/ab_scorecard.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from streamclient_spark.plans.registry import load_all
from streamclient_spark.scale import ranked_by_range
from streamclient_spark.session import get_spark
from streamclient_spark.tables import load


def sc_pivot(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    m = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("revenue_cents"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(
                F.round(F.col("l_quantity") * 100).cast("bigint")
            ).alias("qty_cents"),
        )
        .localCheckpoint(eager=False)  # stacked read + |spine| scalar
    )
    stacked = m.select(
        "suppkey",
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(t).cast("long").alias("tag"),
                        F.col(c).cast("bigint").alias("v"),
                    )
                    for t, c in enumerate(
                        ("revenue_cents", "n_parts", "qty_cents")
                    )
                )
            )
        ).alias("s"),
    ).select("suppkey", "s.tag", "s.v")
    ranked = ranked_by_range(
        stacked, ["tag", F.desc("v"), F.asc("suppkey")], rank_col="grk"
    )
    n1 = m.select(F.count(F.lit(1)).alias("__n"))
    agg = (
        ranked.crossJoin(F.broadcast(n1))
        .groupBy("suppkey")
        .agg(
            F.sum(
                F.when(F.col("tag") == 0, 50 * F.col("grk"))
                .when(F.col("tag") == 1, 30 * (F.col("grk") - F.col("__n")))
                .otherwise(20 * (F.col("grk") - 2 * F.col("__n")))
            )
            .cast("long")
            .alias("score_points"),
            F.max(F.when(F.col("tag") == 0, F.col("v")))
            .cast("long")
            .alias("revenue_cents"),
            F.max(F.when(F.col("tag") == 1, F.col("v")))
            .cast("long")
            .alias("n_parts"),
            F.max(F.when(F.col("tag") == 2, F.col("v")))
            .cast("long")
            .alias("qty_cents"),
        )
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_name").alias("supplier"),
        "s_nationkey",
    )
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("nation"),
    )
    return (
        agg.join(F.broadcast(s), "suppkey")
        .join(F.broadcast(n), "s_nationkey")
        .select(
            F.col("suppkey").alias("supp_key"),
            "supplier",
            "nation",
            "revenue_cents",
            "n_parts",
            "qty_cents",
            "score_points",
        )
        .orderBy(F.asc("score_points"), F.asc("supp_key"))
        .limit(20)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-scorecard")
    cur = load_all()["q_supplier_scorecard"].builder
    a = cur(spark, sf_dir).collect()
    b = sc_pivot(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], (a[:3], b[:3])
    print(f"identical {len(a)} rows", flush=True)
    for label, fn in [("current", cur), ("pivot", sc_pivot)]:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        print(label, [round(t, 3) for t in ts], "min", round(min(ts), 3))
    spark.stop()


if __name__ == "__main__":
    main()
