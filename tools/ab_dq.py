"""A/B: DQ-family builders — r11 DataFrame/Py4J construction (OLD,
bodies copied verbatim from the pre-r12 tree) vs the r12 spark.sql
string form (NEW, the live registry builders). Plans are operator-
identical (plans/r12/*_{before,after}.txt); the delta under test is
driver-side plan construction (guide §7.3). Interleaved A,B,A,B so
host drift hits both arms alike; per-arm build/exec split printed.

Run: python tools/ab_dq.py <sf_dir> [reps]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

from streamclient_spark.operators.relational import (
    _DQ_RULES,
    _FD_CANDIDATES,
    _FK_EDGES,
    _UNIQ_KEYS,
    _audit_scan,
)
from streamclient_spark.plans.registry import load_all
from streamclient_spark.session import get_spark
from streamclient_spark.tables import load


def old_fd_audit(spark, sf_dir):
    from collections import defaultdict

    by_table = defaultdict(list)
    labels = []
    for i, (label, table, lhs, rhs) in enumerate(_FD_CANDIDATES):
        by_table[table].append((i, lhs, rhs))
        labels.append(label)

    def _typed(col, dtypes):
        c = F.col(col)
        if dtypes[col] == "string":
            return F.lit(None).cast("long"), c
        if dtypes[col] not in ("tinyint", "smallint", "int", "bigint"):
            raise TypeError(col)
        return c.cast("long"), F.lit(None).cast("string")

    parts = []
    for table, fds in by_table.items():
        src = _audit_scan(spark, sf_dir, table)
        dt = dict(src.dtypes)
        tagged = []
        for i, lhs, rhs in fds:
            ll, ls = _typed(lhs, dt)
            rl, rs = _typed(rhs, dt)
            tagged.append(
                F.struct(
                    F.lit(i).alias("e"),
                    ll.alias("ll"),
                    ls.alias("ls"),
                    F.when(
                        F.col(rhs).isNotNull(),
                        F.struct(rl.alias("rl"), rs.alias("rs")),
                    ).alias("r"),
                )
            )
        parts.append(
            (
                src.select(F.explode(F.array(*tagged)).alias("t"))
                if len(tagged) > 1
                else src.select(tagged[0].alias("t"))
            ).select("t.e", "t.ll", "t.ls", "t.r")
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    g = u.groupBy("e", "ll", "ls").agg(F.countDistinct("r").alias("v"))
    return (
        g.groupBy("e")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lhs"),
            F.sum((F.col("v") > 1).cast("long")).alias("n_violating"),
            F.max("v").cast("long").alias("max_rhs_variants"),
        )
        .select(
            F.element_at(
                F.array(*[F.lit(x) for x in labels]), F.col("e") + 1
            ).alias("fd"),
            "n_lhs",
            F.col("n_violating").cast("long").alias("n_violating"),
            "max_rhs_variants",
            (F.col("n_violating") == 0).alias("holds"),
            F.expr("n_violating * 1000 div n_lhs")
            .cast("long")
            .alias("violation_permille"),
        )
    )


def old_uniqueness(spark, sf_dir):
    from collections import defaultdict

    by_table = defaultdict(list)
    labels = []
    for i, (table, cols) in enumerate(_UNIQ_KEYS):
        by_table[table].append((i, cols))
        labels.append(f"{table}({','.join(cols)})")

    parts = []
    for table, keys in by_table.items():
        src = _audit_scan(spark, sf_dir, table)
        tagged = [
            F.struct(
                F.lit(i).alias("e"),
                F.col(cols[0]).cast("long").alias("k1"),
                (
                    F.col(cols[1]).cast("long")
                    if len(cols) > 1
                    else F.lit(None).cast("long")
                ).alias("k2"),
            )
            for i, cols in keys
        ]
        parts.append(
            (
                src.select(F.explode(F.array(*tagged)).alias("t"))
                if len(tagged) > 1
                else src.select(tagged[0].alias("t"))
            ).select("t.e", "t.k1", "t.k2")
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    per_key = u.groupBy("e", "k1", "k2").agg(F.count(F.lit(1)).alias("c"))
    dup = F.col("c") > 1
    return (
        per_key.groupBy("e")
        .agg(
            F.sum("c").cast("long").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.when(dup, 1).otherwise(0)).alias("n_dup_keys"),
            F.sum(F.when(dup, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_dup_rows"),
        )
        .select(
            F.element_at(
                F.array(*[F.lit(x) for x in labels]), F.col("e") + 1
            ).alias("key_name"),
            "n_rows",
            "n_keys",
            "n_dup_keys",
            "n_dup_rows",
        )
    )


def old_referential(spark, sf_dir):
    from collections import defaultdict

    roles = defaultdict(list)
    labels = []
    for i, (child, fk, parent, pk) in enumerate(_FK_EDGES):
        roles[child].append((i, fk, True))
        roles[parent].append((i, pk, False))
        labels.append(f"{child}.{fk}->{parent}.{pk}")

    parts = []
    for table, rs in roles.items():
        tagged = [
            F.struct(
                (
                    F.coalesce(
                        F.col(col).cast("long") * 8 + F.lit(i),
                        F.lit(-(2**62) + i),
                    )
                    if is_child
                    else F.col(col).cast("long") * 8 + F.lit(i)
                ).alias("ek"),
                F.lit(1 if is_child else 0).alias("c"),
                F.lit(0 if is_child else 1).alias("p"),
            )
            for i, col, is_child in rs
        ]
        src = load(spark, sf_dir, table)
        parts.append(
            (
                src.select(F.explode(F.array(*tagged)).alias("t"))
                if len(tagged) > 1
                else src.select(tagged[0].alias("t"))
            ).select("t.ek", "t.c", "t.p")
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)

    per_key = u.filter(F.col("ek").isNotNull()).groupBy("ek").agg(
        F.sum("c").alias("c"), F.max("p").alias("p")
    )
    orphan = F.col("p") == 0
    return (
        per_key.filter(F.col("c") > 0)
        .groupBy(F.expr("CAST(pmod(ek, 8) AS INT)").alias("e"))
        .agg(
            F.count(F.lit(1)).alias("n_child_keys"),
            F.sum("c").cast("long").alias("n_child_rows"),
            F.sum(F.when(orphan, 1).otherwise(0)).alias("n_orphan_keys"),
            F.sum(F.when(orphan, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_orphan_rows"),
        )
        .select(
            F.element_at(
                F.array(*[F.lit(x) for x in labels]), F.col("e") + 1
            ).alias("fk_edge"),
            "n_child_keys",
            "n_child_rows",
            "n_orphan_keys",
            "n_orphan_rows",
        )
    )


def old_constraints(spark, sf_dir):
    parts = []
    by_table = {}
    for name, table, pred in _DQ_RULES:
        by_table.setdefault(table, []).append((name, pred))
    for table, rules in by_table.items():
        t = load(spark, sf_dir, table)
        agg = t.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.coalesce(
                    F.sum(F.when(F.expr(pred), 1).otherwise(0)), F.lit(0)
                )
                .cast("long")
                .alias(f"_v{i}")
                for i, (_name, pred) in enumerate(rules)
            ],
        )
        for i, (name, _pred) in enumerate(rules):
            parts.append(
                agg.select(
                    F.lit(name).alias("rule"),
                    "n_rows",
                    F.col(f"_v{i}").alias("n_violations"),
                )
            )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = l.join(o, l["l_orderkey"] == o["o_orderkey"])
    parts.append(
        j.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("l_shipdate") < F.col("o_orderdate"), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_violations"),
        ).select(
            F.lit("lineitem.ships_after_order").alias("rule"),
            "n_rows",
            "n_violations",
        )
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-dq")
    specs = load_all()
    specs["q_scan_events"].builder(spark, sf_dir).count()  # warm JVM

    pairs = [
        ("fd_audit", old_fd_audit, specs["q_dq_fd_audit"].builder),
        ("uniqueness", old_uniqueness, specs["q_dq_uniqueness"].builder),
        ("referential", old_referential, specs["q_dq_referential"].builder),
        ("constraints", old_constraints, specs["q_dq_constraints"].builder),
    ]
    # results identical?
    from tests.oracle import canonical_rows

    for name, old, new in pairs:
        a = canonical_rows(old(spark, sf_dir).toPandas())
        b = canonical_rows(new(spark, sf_dir).toPandas())
        assert a == b, name
        print(f"{name}: identical rows", flush=True)

    res: dict[str, dict[str, list]] = {}
    for name, old, new in pairs:
        res[name] = {"old": [], "new": []}
        for _ in range(reps):
            for arm, fn in (("old", old), ("new", new)):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                res[name][arm].append((t1 - t0, t2 - t1))
    for name in res:
        for arm in ("old", "new"):
            runs = res[name][arm]
            b = min(r[0] for r in runs)
            e = min(r[1] for r in runs)
            t = min(r[0] + r[1] for r in runs)
            print(
                f"{name} {arm}: build {b:.3f} exec {e:.3f} "
                f"total(min) {t:.3f}  all={[round(x + y, 3) for x, y in runs]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
