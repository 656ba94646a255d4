"""Fixture-table catalog: parquet loaders for the driver test tables.

Tables (TESTDATA.md / FIXTURES.md §A): ``region nation customer
supplier part orders lineitem events documents embeddings`` — one
parquet per table under ``/root/testdata/sf*/``.

At the 100 TB design point each of these would be a partitioned /
bucketed table (lineitem bucketed by ``l_orderkey``, orders by
``o_orderkey``, events hash-distributed by key and range-partitioned by
event-time day); the loaders stay the same shape — ``spark.read`` with
schema-on-read and Catalyst pushdown — only the storage layout changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables that are safe to broadcast-hint unconditionally: fixed-size
# at every scale factor (region = 5 rows, nation = 25 rows).  Everything
# else — including customer/supplier/part — grows linearly with SF and
# must NOT carry a hard broadcast hint: at the 100 TB design point they
# are hundreds of GB and a forced broadcast would OOM every executor.
# Size-based upgrades are left to Catalyst/AQE — or to the size-GATED
# hint below, which only fires when Catalyst's own static estimate says
# the input is small, and degrades to "no hint, AQE decides" otherwise.
BROADCAST_DIMS = frozenset({"region", "nation"})

# Static-estimate ceiling for broadcast_if_small(). Catalyst's
# size-only estimator (no CBO here) accounts for column pruning but
# NOT filter selectivity, so it over-states filtered inputs — the
# ceiling is the session's 10 MB autoBroadcastJoinThreshold with ~3×
# selectivity allowance. An input whose UNfiltered, pruned bytes clear
# 32 MB is small enough to broadcast under any filter; one that
# doesn't is left to AQE's runtime-measured decision.
BROADCAST_HINT_MAX_EST_BYTES = 32 << 20


def broadcast_if_small(df: DataFrame, upper: DataFrame | None = None) -> DataFrame:
    """Broadcast-hint ``df`` only when a sound static size estimate is
    below :data:`BROADCAST_HINT_MAX_EST_BYTES`; otherwise return ``df``
    unhinted and let AQE pick the join strategy from runtime stats.

    This is the BROADCAST_DIMS policy extended to *derived* inputs
    (filtered dims, key-join reductions): the hint expresses where AQE
    lands anyway at fixture scales — skipping the static SMJ's
    materialized fact exchange — but unlike a bare ``F.broadcast()``
    it comes off BY CONSTRUCTION once the input's estimate outgrows the
    ceiling, so a 100 TB run can never force-broadcast a fact-scaled
    table (ADVICE r9, medium).

    ``upper``: for join-DERIVED inputs Catalyst's size-only join
    estimate is a row-count product (useless — measured 48 GB for an
    89 k-row reduction), so the caller passes a plan whose estimate is
    a sound upper bound instead. Soundness is the caller's semantic
    knowledge, e.g. for ``fact ⋉/⋈ dim`` on the dim's UNIQUE key the
    output has at most the fact side's rows, so the fact side projected
    to the kept columns bounds the result within projection width.

    Estimate failures (no _jdf, analysis error) fail SAFE: no hint.
    """
    gate = upper if upper is not None else df
    try:
        est = int(
            str(gate._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return df
    if est <= BROADCAST_HINT_MAX_EST_BYTES:
        from pyspark.sql.functions import broadcast

        return broadcast(df)
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame (columnar parquet scan;
    Catalyst handles column pruning + predicate pushdown).

    ``events.ts`` is parquet ``TIMESTAMP(NANOS)``, which Spark's vectorized
    reader rejects outright (PARQUET_TYPE_ILLEGAL). We read it as raw
    nanos (legacy ``nanosAsLong`` conf) and truncate to a microsecond
    TimestampType — integer `div`, no double round-trip, so the value
    matches DuckDB's ``CAST(ts AS TIMESTAMP)`` exactly.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # The driver runs these builders in ITS OWN SparkSession; pin the
    # session confs correctness depends on (idempotent, runtime-settable).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # driver fixture: TIMESTAMP(NANOS) surfaced as raw nanos
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        # regenerated fixtures (tools/make_bigsf.py) may carry a
        # timestamp type Spark reads natively; normalize NTZ → UTC
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
