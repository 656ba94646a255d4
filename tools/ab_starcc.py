"""A/B: connected_components_star round mechanics — the r11 shape
(one lazy localCheckpoint + checksum job per round; copied verbatim
below as ``cc_star_lazy``) vs the LIVE kernel (r12: two alternating-
star rounds per materialization+checksum job — one job per TWO
rounds, soundness via the strictly-decreasing potential, see
scale.py). Labels must be identical; the job/wall deltas are the
measurement. Timed through q_graph_cc's full builder (edge derivation
included, keyed cache released between reps so every rep pays the
true cost).
Run: python tools/ab_starcc.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, functions as F

from streamclient_spark.cacheutil import release_all
from streamclient_spark.operators.relational import _copurchase_edges
from streamclient_spark.session import get_spark


def cc_star_lazy(edges: DataFrame, src: str = "u", dst: str = "v"):
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def checksum(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).first()
        return row["n"], row["h"]

    sig = checksum(e)
    rounds = 0
    for rounds in range(1, 41):
        sym = e.select("a", "b").union(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).toDF("u", "v")
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        e = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        bmin = e.groupBy("a").agg(F.min("b").alias("m"))
        joined = e.join(bmin, "a")
        e = (
            joined.select(F.col("a"), F.col("m").alias("b"))
            .union(
                joined.filter(F.col("b") != F.col("m")).select(
                    F.col("b").alias("a"), F.col("m").alias("b")
                )
            )
            .distinct()
            .localCheckpoint(eager=False)  # materialized by the checksum
        )
        new_sig = checksum(e)
        if new_sig == sig:
            break
        sig = new_sig

    members = e.select(F.col("a").alias("node"), F.col("b").alias("label"))
    roots = (
        e.select(F.col("b").alias("node"))
        .distinct()
        .join(members.select("node"), "node", "left_anti")
        .withColumn("label", F.col("node"))
    )
    return members.union(roots), rounds


def cc_current(spark, sf_dir):
    from streamclient_spark.scale import connected_components_star

    e = _copurchase_edges(spark, sf_dir)
    labels, _r = connected_components_star(e, src="u", dst="v")
    return labels.select("node", F.col("label").alias("component"))


def cc_lazy(spark, sf_dir):
    e = _copurchase_edges(spark, sf_dir)
    labels, _r = cc_star_lazy(e, src="u", dst="v")
    return labels.select("node", F.col("label").alias("component"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-starcc")
    st = spark.sparkContext.statusTracker()

    def njobs():
        ids = st.getJobIdsForGroup(None)
        return max(ids) if ids else 0

    a = cc_current(spark, sf_dir).orderBy("node").collect()
    b = cc_lazy(spark, sf_dir).orderBy("node").collect()
    assert a == b, (len(a), len(b))
    print(f"identical {len(a)} labels", flush=True)
    fns = [("live(r12-chunked)", cc_current), ("r11(1job/round)", cc_lazy)]
    ts = {label: [] for label, _ in fns}
    jobs = {}
    for _ in range(reps):
        for label, fn in fns:  # interleaved; cache released per rep
            release_all()
            j0 = njobs()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts[label].append(time.perf_counter() - t0)
            jobs[label] = njobs() - j0
    import statistics

    for label, _ in fns:
        xs = ts[label]
        print(label, [round(t, 3) for t in xs], "min", round(min(xs), 3),
              "med", round(statistics.median(xs), 3), "jobs", jobs[label])
    spark.stop()


if __name__ == "__main__":
    main()
