"""A/B: q_text_novelty — shingle table joined back onto the df
aggregate (current: three |shingle|-scale exchanges) vs the
singleton-attribution rewrite: a df=1 shingle occurs EXACTLY ONCE in
the whole corpus, so min(doc_id) inside the per-shingle aggregate IS
its owning document and the |shingle|-row join + third |shingle|
shuffle collapse to a |docs|-row left join of two aggregates.
Run: python tools/ab_novelty.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from streamclient_spark.functions.dedup import hash32
from streamclient_spark.functions.text import shingles, tokens
from streamclient_spark.session import get_spark
from streamclient_spark.tables import load


def _sh(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", F.explode(shingles(tokens("text"))).alias("s0"))
        .select("doc_id", hash32("s0").alias("s"))
    )


def novelty_current(spark, sf_dir):
    sh = _sh(spark, sf_dir)
    df = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    j = sh.join(df, "s")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count_if(F.col("df") == 1).alias("n_unique"),
        F.expr("count_if(df = 1) * 1000 div count(1)")
        .cast("long")
        .alias("novelty_permille"),
    )


def novelty_rewrite(spark, sf_dir):
    sh = _sh(spark, sf_dir)
    per_s = sh.groupBy("s").agg(
        F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("d0")
    )
    uniq = (
        per_s.filter(F.col("df") == 1)
        .groupBy(F.col("d0").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    totals = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    return totals.join(uniq, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce(F.col("n_unique"), F.lit(0)).alias("n_unique"),
        F.expr("coalesce(n_unique, 0) * 1000 div n_shingles")
        .cast("long")
        .alias("novelty_permille"),
    )


def novelty_hybrid(spark, sf_dir):
    """One explode; totals from a size() projection (no second explode,
    no doc_id shuffle of the exploded table); singleton attribution via
    min(doc_id) in the per-shingle aggregate."""
    d = load(spark, sf_dir, "documents")
    sh = _sh(spark, sf_dir)
    per_s = sh.groupBy("s").agg(
        F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("d0")
    )
    uniq = (
        per_s.filter(F.col("df") == 1)
        .groupBy(F.col("d0").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    totals = d.select(
        "doc_id", F.size(shingles(tokens("text"))).alias("n_shingles")
    ).filter(F.col("n_shingles") > 0)
    return totals.join(uniq, "doc_id", "left").select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.coalesce(F.col("n_unique"), F.lit(0)).alias("n_unique"),
        F.expr("coalesce(n_unique, 0) * 1000 div n_shingles")
        .cast("long")
        .alias("novelty_permille"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-novelty")
    a = novelty_current(spark, sf_dir).orderBy("doc_id").collect()
    b = novelty_rewrite(spark, sf_dir).orderBy("doc_id").collect()
    assert a == b, (len(a), len(b), a[:3], b[:3])
    print(f"identical {len(a)} rows", flush=True)
    fns = [
        ("current", novelty_current),
        ("rewrite", novelty_rewrite),
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
