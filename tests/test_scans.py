"""Round-trip pinning for the staged CSV/JSON scans (B-S2) and the
stream-static / stream-stream join wrappers (B-T6)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from streamclient_spark.operators.scans import (
    q_scan_csv,
    q_scan_json,
    q_scan_orc,
)
from streamclient_spark.streaming.joins import (
    stream_static_join,
    stream_stream_join,
)
from streamclient_spark.tables import load

UTC = timezone.utc


def _canon(df):
    return sorted(
        map(
            tuple,
            df.select(
                "event_id", "ts", "user_id", "event_type", "value", "props"
            ).collect(),
        )
    )


def test_csv_and_json_scans_round_trip(spark, sf_smoke):
    # all three staged scans now return the exact-integer oracle
    # projection (unix-micros ts, 1e-4 fixed-point value); round-trip
    # against the identically-projected parquet truth
    def canon_exact(df):
        return sorted(map(tuple, df.collect()))

    truth_exact = canon_exact(
        load(spark, sf_smoke, "events").select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.round(F.col("value") * 10000, 0).cast("long").alias(
                "value_e4"
            ),
        )
    )
    assert canon_exact(q_scan_csv(spark, sf_smoke)) == truth_exact
    assert canon_exact(q_scan_orc(spark, sf_smoke)) == truth_exact
    assert canon_exact(q_scan_json(spark, sf_smoke)) == truth_exact
    # the RAW staged files still round-trip every column (incl. the
    # quoted props string the projection drops)
    from streamclient_spark.operators.scans import CSV_SCHEMA, _stage

    raw_csv = (
        spark.read.schema(CSV_SCHEMA)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(_stage(spark, sf_smoke, "csv"))
    )
    assert _canon(raw_csv) == _canon(load(spark, sf_smoke, "events"))


def test_stream_static_join_enriches_with_broadcast_dim(spark, sf_smoke, tmp_path):
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 10.0)], "event_type string, weight double"
    )
    src = str(tmp_path / "ev")
    load(spark, sf_smoke, "events").limit(200).write.parquet(src)
    stream = spark.readStream.schema(
        load(spark, sf_smoke, "events").schema
    ).parquet(src)
    joined = stream_static_join(stream, dim, on="event_type")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM ss_join")
    expect = spark.read.parquet(src).join(dim, "event_type").count()
    assert out.count() == expect
    assert "weight" in out.columns


def test_stream_stream_join_honors_time_bound(spark, tmp_path):
    def ts(minute):
        return datetime(2024, 1, 1, 12, minute, tzinfo=UTC)

    left_rows = [("k1", ts(0)), ("k2", ts(0))]
    right_rows = [
        ("k1", ts(5)),   # within 15-minute window → joins
        ("k1", ts(40)),  # outside window → dropped
        ("k2", ts(10)),  # within → joins
        ("k3", ts(1)),   # no matching left key
    ]
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(left_rows, "k string, ts timestamp").write.parquet(lsrc)
    spark.createDataFrame(right_rows, "k string, ts timestamp").write.parquet(rsrc)
    left = spark.readStream.schema("k string, ts timestamp").parquet(lsrc)
    right = spark.readStream.schema("k string, ts timestamp").parquet(rsrc)
    joined = stream_stream_join(
        left, right, "k", watermark="1 minute", window="15 minutes"
    ).select(
        F.col("l.k").alias("k"), F.col("r.ts").alias("rts")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss2_join")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["k"], r["rts"].replace(tzinfo=UTC))
        for r in spark.sql("SELECT * FROM ss2_join").collect()
    )
    assert got == [("k1", ts(5)), ("k2", ts(10))]
