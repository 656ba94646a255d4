"""Exactness pinning for the numeric compat layer: the two-limb long
aggregation (compat.limb_sums/limb_value) must produce BIT-IDENTICAL
doubles to the exact-decimal formulation it replaced — on sums whose
magnitude exceeds 2^53 (where naive double summation loses integer
exactness) and on compound money products."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamclient_spark.compat import (
    dec2,
    dec_sum,
    limb_sums,
    limb_value,
    scaled2,
)


def _money_df(spark, n=200_000, seed=3):
    rng = np.random.default_rng(seed)
    # wide magnitude so group sums pass 2^53 at scale 4 (still exact
    # cents: values ≤ 1e7 are exact to 2 decimals in a double)
    price = np.round(rng.uniform(100_000.0, 10_000_000.0, n), 2)
    disc = np.round(rng.uniform(0.0, 0.10, n), 2)
    tax = np.round(rng.uniform(0.0, 0.08, n), 2)
    group = rng.integers(0, 4, n)
    return spark.createDataFrame(
        [
            (int(g), float(p), float(d), float(t))
            for g, p, d, t in zip(group, price, disc, tax)
        ],
        "g int, price double, disc double, tax double",
    )


def test_limb_sum_equals_decimal_sum_exactly(spark):
    df = _money_df(spark)
    got = {
        r["g"]: (r["simple"], r["product"])
        for r in df.groupBy("g")
        .agg(
            *limb_sums(scaled2("price"), "p"),
            *limb_sums(
                scaled2("price") * (F.lit(100) - scaled2("disc")), "dp"
            ),
        )
        .select(
            "g",
            limb_value("p", 2).alias("simple"),
            limb_value("dp", 4).alias("product"),
        )
        .collect()
    }
    want = {
        r["g"]: (r["simple"], r["product"])
        for r in df.groupBy("g")
        .agg(
            dec_sum("price").alias("simple"),
            F.sum(dec2("price") * (1 - dec2("disc")))
            .cast("double")
            .alias("product"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        # bit-identical, not approximately equal
        assert got[g][0] == want[g][0], (g, got[g][0], want[g][0])
        assert got[g][1] == want[g][1], (g, got[g][1], want[g][1])
    # the scale-4 product sums genuinely exceed double-exact integer
    # range — i.e. this test would catch a naive double formulation
    total_scale4 = sum(int(round(v[1] * 10_000)) for v in want.values())
    assert total_scale4 > 2**53


def test_limb_triple_product_matches_decimal(spark):
    df = _money_df(spark, n=50_000, seed=9)
    charge_s = (
        scaled2("price")
        * (F.lit(100) - scaled2("disc"))
        * (F.lit(100) + scaled2("tax"))
    )
    got = (
        df.agg(*limb_sums(charge_s, "c"))
        .select(limb_value("c", 6).alias("v"))
        .collect()[0]["v"]
    )
    want = (
        df.agg(
            F.sum(
                dec2("price") * (1 - dec2("disc")) * (1 + dec2("tax"))
            ).cast("double")
        ).collect()[0][0]
    )
    assert got == want


def test_limb_rejects_nothing_but_matches_on_integers(spark):
    # integer-valued measures (quantities) round-trip exactly too
    df = spark.range(0, 10_000).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 50 + 1).cast("double").alias("qty"),
    )
    got = {
        r["g"]: r["v"]
        for r in df.groupBy("g")
        .agg(*limb_sums(scaled2("qty"), "q"))
        .select("g", limb_value("q", 2).alias("v"))
        .collect()
    }
    want = {
        r["g"]: float(r["v"])
        for r in df.groupBy("g").agg(F.sum("qty").alias("v")).collect()
    }
    assert got == pytest.approx(want, abs=0)  # exact
