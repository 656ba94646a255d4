"""A/B: the r12 sampler-free range layout (scale._place_by_bounds —
literal percentile bounds + hash-representative placement + literal
offsets) vs the r11 sampler form (repartitionByRange + lazy
localCheckpoint + counts window + broadcast-join offsets; OLD helper
bodies copied verbatim below) across every registry consumer:
q_events_rfm, q_supplier_scorecard, q_customer_migration,
q_pareto_abc, q_part_abc_xyz, q_skyline_2d, q_rank_global.

Interleaved OLD,NEW,OLD,NEW in one JVM so host drift hits both arms
alike; per arm the builder/exec split AND the Spark job count are
printed (the job-count drop is the scale-relevant claim — fewer
driver-scheduled jobs and one payload exchange instead of two in the
running_sum/max consumers).

r12 OUTCOME (quiet-box, 7-9 reps, medians): ranked_by_range ADOPTED
the sampler-free layout — rfm 1.38→1.13 s, migration 1.54→1.32 s
(wins), scorecard/rank_global ties with job counts 15→11 and 8→6.
running_sum/max KEPT the sampler form — abc_xyz 2.04→2.46 s and
skyline 0.65→0.84 s losses (the probe aggregate costs more than the
sampler pass + skinny second exchange it removes on these small
spines, and those consumers shed no crossJoin to pay for it); the
NEW arms of the running consumers in this file therefore measure the
rejected variant (guide §1.3 negative result), reconstructable by
pointing them at scale._place_by_bounds again.

Run: python tools/ab_rangehelpers.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from streamclient_spark.cacheutil import release_managed
from streamclient_spark.plans.registry import load_all
from streamclient_spark.scale import ntile_from_rank
from streamclient_spark.session import get_spark
from streamclient_spark.tables import load

# --------------------------------------------------------------------------
# OLD (r11) helpers, verbatim
# --------------------------------------------------------------------------


def ranked_by_range_old(df, order_cols, *, rank_col="rank",
                        num_partitions=None):
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    part = df.repartitionByRange(int(n), *order_cols).sortWithinPartitions(
        *order_cols
    )
    cols = list(df.columns)
    numbered = part.select(
        "*",
        F.spark_partition_id().alias("__pid"),
        (
            F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
        ).alias("__local"),
    ).localCheckpoint(eager=False)
    counts = (
        numbered.groupBy("__pid").agg(F.count("*").alias("__n"))
        .orderBy("__pid")
    )
    w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "__pid", (F.sum("__n").over(w) - F.col("__n")).alias("__offset")
    )
    return numbered.join(F.broadcast(offsets), "__pid").select(
        *cols, (F.col("__offset") + F.col("__local") + 1).alias(rank_col)
    )


def running_sum_by_range_old(df, order_cols, value_col, *,
                             out_col="running_sum", num_partitions=None):
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    part = (
        df.repartitionByRange(int(n), *order_cols)
        .select("*", F.spark_partition_id().alias("__pid"))
        .localCheckpoint(eager=False)
    )
    cols = list(df.columns)
    w_local = Window.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = part.select(
        "*", F.sum(value_col).over(w_local).alias("__run_local")
    )
    totals = part.groupBy("__pid").agg(F.sum(value_col).alias("__t"))
    w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "__pid", (F.sum("__t").over(w) - F.col("__t")).alias("__offset")
    )
    return local.join(F.broadcast(offsets), "__pid").select(
        *cols, (F.col("__offset") + F.col("__run_local")).alias(out_col)
    )


def running_max_by_range_old(df, order_cols, value_col, *,
                             out_col="running_max", strict=False,
                             num_partitions=None):
    n = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    part = (
        df.repartitionByRange(int(n), *order_cols)
        .select("*", F.spark_partition_id().alias("__pid"))
        .localCheckpoint(eager=False)
    )
    cols = list(df.columns)
    hi = Window.currentRow - 1 if strict else Window.currentRow
    w_local = Window.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, hi
    )
    local = part.select(
        "*", F.max(value_col).over(w_local).alias("__run_local")
    )
    totals = part.groupBy("__pid").agg(F.max(value_col).alias("__t"))
    w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = totals.select("__pid", F.max("__t").over(w).alias("__offset"))
    run = F.when(F.col("__run_local").isNull(), F.col("__offset")).otherwise(
        F.when(F.col("__offset").isNull(), F.col("__run_local")).otherwise(
            F.greatest("__run_local", "__offset")
        )
    )
    return local.join(F.broadcast(offsets), "__pid").select(
        *cols, run.alias(out_col)
    )


# --------------------------------------------------------------------------
# OLD (r11) consumer shapes, verbatim
# --------------------------------------------------------------------------


def rfm_old(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("w"))
    u = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )
    u = (
        u.join(F.broadcast(wm))
        .select(
            "user_id",
            F.datediff("w", "last_ts").cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
        .localCheckpoint(eager=False)
    )
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
    rk = ranked_by_range_old(
        stacked, ["__axis", "__k", "user_id"], rank_col="__g"
    )
    per_axis = rk.join(F.broadcast(n_total)).select(
        "user_id",
        "__axis",
        ntile_from_rank(
            F.col("__g") - F.col("__axis") * F.col("__N"), F.col("__N"), 5
        ).alias("__q"),
    )
    quint = per_axis.groupBy("user_id").agg(
        F.max(F.when(F.col("__axis") == 0, F.col("__q"))).alias("r"),
        F.max(F.when(F.col("__axis") == 1, F.col("__q"))).alias("f"),
        F.max(F.when(F.col("__axis") == 2, F.col("__q"))).alias("m"),
    )
    s = u.join(quint, "user_id")
    seg = (
        F.when((F.col("r") <= 2) & (F.col("f") <= 2), "core")
        .when(F.col("r") <= 2, "recent")
        .when(F.col("f") <= 2, "lapsing-heavy")
        .otherwise("tail")
    )
    return s.select(
        "user_id", "recency_days", "frequency", "monetary_cents",
        "r", "f", "m", seg.alias("segment"),
    )


def scorecard_old(spark, sf_dir):
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
        .localCheckpoint(eager=False)
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
    ranked = ranked_by_range_old(
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
            "supplier", "nation", "revenue_cents", "n_parts",
            "qty_cents", "score_points",
        )
        .orderBy(F.asc("score_points"), F.asc("supp_key"))
        .limit(20)
    )


def migration_old(spark, sf_dir):
    from streamclient_spark.operators.relational import _MIGRATE_SPLIT_YEAR

    cp = (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust"),
            F.when(
                F.year(F.to_date("o_orderdate")) < _MIGRATE_SPLIT_YEAR,
                F.lit(0),
            )
            .otherwise(F.lit(1))
            .alias("p"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("rc"),
        )
        .groupBy("cust", "p")
        .agg(F.sum("rc").alias("rc"))
    )
    ranked = ranked_by_range_old(
        cp, ["p", F.desc("rc"), F.asc("cust")], rank_col="grk"
    )
    bounds = ranked.groupBy(F.col("p").alias("p0")).agg(
        F.min("grk").alias("r0"), F.count(F.lit(1)).alias("np")
    )
    seg = ranked.join(
        F.broadcast(bounds), F.col("p") == F.col("p0")
    ).select(
        "cust", "p", F.expr("(grk - r0) * 3 div np").cast("long").alias("s")
    )
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


def pareto_old(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "cents"
        )
    ).localCheckpoint(eager=False)
    total = r.agg(F.sum("cents").alias("total_cents"))
    c = running_sum_by_range_old(
        r, [F.desc("cents"), F.asc("o_custkey")], "cents",
        out_col="cum_cents",
    ).join(F.broadcast(total))
    dec = "decimal(38,0)"
    cum100 = F.col("cum_cents").cast(dec) * 100
    tot = F.col("total_cents").cast(dec)
    return c.select(
        "o_custkey", "cents", "cum_cents",
        F.round(
            F.col("cum_cents").cast("double")
            / F.col("total_cents").cast("double") * 100, 6
        ).alias("cum_pct"),
        F.when(cum100 <= tot * 80, "A")
        .when(cum100 <= tot * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )


def abc_xyz_old(spark, sf_dir):
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
    cum = running_sum_by_range_old(
        pp, [F.desc("revenue"), F.asc("partkey")], "revenue", out_col="cum"
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


def skyline_old(spark, sf_dir):
    p = load(spark, sf_dir, "part")
    g = p.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("mx")
    )
    f = running_max_by_range_old(
        g, ["price"], "mx", out_col="pmx", strict=True
    ).filter(F.col("pmx").isNull() | (F.col("mx") > F.col("pmx")))
    return p.join(
        f,
        (p["p_retailprice"] == f["price"]) & (p["p_size"] == f["mx"]),
    ).select(
        F.col("p_partkey").alias("part_key"),
        F.col("p_retailprice").alias("retail_price"),
        F.col("p_size").cast("long").alias("part_size"),
    )


def rank_global_old(spark, sf_dir):
    l = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return ranked_by_range_old(
        l, ["l_extendedprice", "l_orderkey", "l_linenumber"]
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-rangehelpers")
    st = spark.sparkContext.statusTracker()

    def njobs():
        ids = st.getJobIdsForGroup(None)
        return max(ids) if ids else 0

    specs = load_all()
    specs["q_scan_events"].builder(spark, sf_dir).count()  # warm JVM

    pairs = [
        ("rfm", rfm_old, specs["q_events_rfm"].builder),
        ("scorecard", scorecard_old, specs["q_supplier_scorecard"].builder),
        ("migration", migration_old, specs["q_customer_migration"].builder),
        ("pareto", pareto_old, specs["q_pareto_abc"].builder),
        ("abc_xyz", abc_xyz_old, specs["q_part_abc_xyz"].builder),
        ("skyline", skyline_old, specs["q_skyline_2d"].builder),
        ("rank_global", rank_global_old, specs["q_rank_global"].builder),
    ]
    from tests.oracle import canonical_rows

    for name, old, new in pairs:
        release_managed()
        a = canonical_rows(old(spark, sf_dir).toPandas())
        release_managed()
        b = canonical_rows(new(spark, sf_dir).toPandas())
        assert a == b, name
        print(f"{name}: identical rows ({len(a[1])})", flush=True)

    res: dict[str, dict[str, list]] = {}
    jobs: dict[str, dict[str, int]] = {}
    for name, old, new in pairs:
        res[name] = {"old": [], "new": []}
        jobs[name] = {}
        for rep in range(reps):
            for arm, fn in (("old", old), ("new", new)):
                release_managed()
                j0 = njobs()
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                res[name][arm].append((t1 - t0, t2 - t1))
                jobs[name][arm] = njobs() - j0
    for name in res:
        for arm in ("old", "new"):
            runs = res[name][arm]
            t = min(x + y for x, y in runs)
            print(
                f"{name} {arm}: total(min) {t:.3f} jobs {jobs[name][arm]} "
                f"build(min) {min(x for x, _ in runs):.3f} "
                f"all={[round(x + y, 3) for x, y in runs]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
