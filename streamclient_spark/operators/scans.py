"""Batch scan operators beyond parquet: CSV and JSON (SURVEY.md §2B B-S2).

The fixture set ships parquet only, so these builders first stage a
deterministic CSV/JSON copy of the ``events`` table under ``/tmp`` (one
time per scale factor, content derived from the parquet fixture) and
then exercise the schema'd readers. Rows-only driver check (no SQL
oracle — the staged file is the builder's artifact); the unit test pins
round-trip equality against the parquet scan.

Scale notes (100 TB): schema'd CSV/JSON reads are splittable line
formats — fine for ingest, wrong for analytics storage (no column
pruning, no predicate pushdown, no stats). The engine's posture is:
read them once, write parquet (see ``q_scan_events`` for the scan that
everything else builds on). ``PERMISSIVE`` mode with a corrupt-record
column is the ingest-grade failure posture.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load

CSV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

_STAGE_ROOT = "/tmp/streamclient_spark_staged"


def _stage(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Write the events table once per (sf, format) as CSV/JSON lines."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"{_STAGE_ROOT}/{tag}/events_{fmt}"
    marker = f"{out}/_SUCCESS"
    if not os.path.exists(marker):
        df = load(spark, sf_dir, "events")
        writer = df.coalesce(1).write.mode("overwrite")
        writer = writer.option(
            "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
        )
        if fmt == "csv":
            writer.option("header", "true").csv(out)
        elif fmt == "orc":
            writer.orc(out)
        else:
            writer.json(out)
    return out


#: exact-integer projection shared by the staged-scan oracles: the
#: staged writer's µs timestamp format and shortest-round-trip double
#: serialization make the text round-trip lossless, so the read-back
#: rows reduce to integer encodings (unix-micros ts, 1e-4 fixed-point
#: value) that hash-match the original parquet rows.
_SCAN_ORACLE = """
    SELECT event_id, user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           CAST(round(value * 10000, 0) AS BIGINT) AS value_e4
    FROM events
    """


def _exact_projection(raw: DataFrame) -> DataFrame:
    return raw.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("value_e4"),
    )


@register("q_scan_csv", oracle=_SCAN_ORACLE)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-S2: schema'd CSV read — explicit StructType (never infer on a
    large corpus: inference is a full extra pass), permissive mode,
    header, µs timestamps. FULL value oracle (VERDICT r4 #7, the
    q_scan_json lossless-staging recipe): the staged µs timestamp
    format plus shortest-round-trip double formatting make the CSV
    round-trip lossless, so the read-back rows project to exact
    integer encodings attested against the original parquet. Raw
    round-trip parity incl. the quoted props column is pinned by
    ``tests/test_scans.py``."""
    path = _stage(spark, sf_dir, "csv")
    return _exact_projection(
        spark.read.schema(CSV_SCHEMA)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


@register(
    "q_scan_json",
    oracle="""
    SELECT event_id, user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           CAST(round(value * 10000, 0) AS BIGINT) AS value_e4
    FROM events
    """,
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-S2: schema'd JSON-lines read — explicit schema (same
    no-inference rule). FULL value oracle (VERDICT r3 #6): the staged
    writer's µs timestamp format and Jackson's round-trip double
    serialization make the JSON round-trip lossless, so the read-back
    rows are projected to exact integer encodings (unix-micros ts,
    1e-4 fixed-point value — the q_scan_text convention) and attested
    against the original parquet rows. Staging + scan must be
    collectively lossless for this to hash-match."""
    path = _stage(spark, sf_dir, "json")
    raw = (
        spark.read.schema(CSV_SCHEMA)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )
    return raw.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("value_e4"),
    )


@register("q_scan_orc", oracle=_SCAN_ORACLE)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-S2: ORC read — the third columnar-adjacent batch format the
    scan surface covers. Unlike CSV/JSON, ORC is a real columnar
    format: the reader supports column pruning and predicate pushdown
    (stripe/row-group stats), so the 100 TB posture matches parquet —
    it is an acceptable analytics storage format, and the engine reads
    it natively rather than forcing a conversion. FULL value oracle
    (VERDICT r4 #7): ORC's binary µs timestamps and IEEE doubles are
    lossless by construction, so the exact-integer projection attests
    against the original parquet rows. Raw round-trip parity is
    pinned by ``tests/test_scans.py``."""
    path = _stage(spark, sf_dir, "orc")
    return _exact_projection(spark.read.schema(CSV_SCHEMA).orc(path))


@register(
    "q_scan_partitioned",
    oracle="""
    SELECT event_type, user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type, user_id
    """,
)
def q_scan_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-S1 scale path: hive-style partition pruning — the events table
    is materialized once per session partitioned by ``event_type``
    (``.../event_type=click/...``), and a two-value predicate then
    reads exactly 2 of 5 partition directories: pruning happens at
    PLANNING time from directory names, before any file I/O (the plan's
    ``PartitionFilters``; pinned by tests/test_plans.py). The aggregate
    result is attested against the plain unpartitioned oracle — layout
    must be invisible in the answer.

    At 100 TB, partitioning by a low-cardinality routing column
    (date, source, language) is the first knob of every lakehouse
    layout: a day/source-scoped query touches that fraction of the
    data — combined with the bucketed layout (q_join_bucketed) this
    covers both predicate- and join-locality. Partition values write
    as directory names; the partition column's type is restored by
    explicit cast (directory-name strings are the hive convention)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"{_STAGE_ROOT}/{tag}/events_by_type"
    if not os.path.exists(f"{out}/_SUCCESS"):
        load(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
            "event_type"
        ).parquet(out)
    e = spark.read.parquet(out)
    return (
        e.filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,4)"))
            .cast("double")
            .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# q_scan_text — raw text source + JSON-line parsing, full oracle
# ---------------------------------------------------------------------------


def _stage_text(spark: SparkSession, sf_dir: str) -> str:
    """Stage events as raw JSON lines with all-exact field encodings
    (longs only: timestamps as unix micros, value in 1e-4 fixed point)
    so the text round-trip is bit-lossless and oracle-checkable —
    unlike the CSV/JSON scans, whose float/timestamp formatting makes
    them rows-only."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"{_STAGE_ROOT}/{tag}/events_text"
    marker = f"{out}/_SUCCESS"
    if not os.path.exists(marker):
        df = load(spark, sf_dir, "events").select(
            F.to_json(
                F.struct(
                    F.col("event_id"),
                    F.col("user_id"),
                    F.col("event_type"),
                    F.unix_micros(F.col("ts")).alias("ts_us"),
                    F.round(F.col("value") * 10000, 0).cast("long").alias("value_e4"),
                )
            ).alias("value")
        )
        df.coalesce(1).write.mode("overwrite").text(out)
    return out


@register(
    "q_scan_text",
    oracle="""
    SELECT event_id, user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           CAST(round(value * 10000, 0) AS BIGINT) AS value_e4
    FROM events
    """,
)
def q_scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-S2 (text): the log-ingestion path — ``spark.read.text`` over
    raw JSON lines, parsed with a schema'd ``from_json`` projection.
    Unlike the CSV/JSON scans (rows-only: their float/timestamp text
    formats are lossy), the staged lines carry only exact integer
    encodings (unix-micros timestamps, 1e-4 fixed-point value), so
    this scan carries a FULL value oracle against the original parquet
    rows: text staging + line parsing must be collectively lossless.
    At scale the text source splits by line ranges and the from_json
    parse is one codegen projection — no inference pass (explicit
    schema, the same no-inference rule as the other scans)."""
    path = _stage_text(spark, sf_dir)
    schema = (
        "event_id bigint, user_id bigint, event_type string, "
        "ts_us bigint, value_e4 bigint"
    )
    parsed = spark.read.text(path).select(
        F.from_json(F.col("value"), schema).alias("r")
    )
    return parsed.select("r.*")


# ---------------------------------------------------------------------------
# q_scan_merge_schema — schema-evolution parquet scan (C-253)
# ---------------------------------------------------------------------------


def _stage_evolved(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Stage the documents table as two parquet generations with
    DIFFERENT schemas — the old generation (even doc_ids) predates the
    ``source`` column, the new one (odd doc_ids) carries it — the
    on-disk layout every long-lived lakehouse table accretes."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"{_STAGE_ROOT}/{tag}/documents_evolved"
    old, new = f"{out}/v1", f"{out}/v2"
    if not (
        os.path.exists(f"{old}/_SUCCESS") and os.path.exists(f"{new}/_SUCCESS")
    ):
        d = load(spark, sf_dir, "documents")
        d.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "lang", "n_chars"
        ).coalesce(1).write.mode("overwrite").parquet(old)
        d.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "lang", "source", "n_chars"
        ).coalesce(1).write.mode("overwrite").parquet(new)
    return old, new


@register(
    "q_scan_merge_schema",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id % 2 = 1 THEN source ELSE NULL END AS source,
           n_chars
    FROM documents
    """,
)
def q_scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan: one logical table whose parquet files
    were written across a schema change (a ``source`` column added
    mid-life), read back as a single DataFrame with
    ``mergeSchema=true`` — old files surface NULL for the column they
    predate. This is the read posture every long-lived lakehouse
    table needs (backfills rewrite nothing; readers reconcile), and
    the staging makes it checkable: the staged generations are
    LOSSLESS projections of the fixture, so the DuckDB oracle
    computes the merged result from the ORIGINAL table (the
    q_scan_json staging doctrine — the oracle never reads the
    builder's own artifact).

    Scale notes (100 TB): schema merge is a FOOTER operation — Spark
    reconciles N file schemas, not N rows; the scan itself stays
    columnar with pushdown/pruning intact on the shared columns.
    Keep generations coarse (schema-per-partition-era, not
    schema-per-file) so footer reconciliation stays cheap, and
    backfill-to-latest only when the NULL semantics stop being
    acceptable to readers."""
    old, new = _stage_evolved(spark, sf_dir)
    merged = (
        spark.read.option("mergeSchema", "true")
        .parquet(old, new)
        .select("doc_id", "lang", "source", "n_chars")
    )
    return merged
