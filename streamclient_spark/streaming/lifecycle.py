"""Keyed alert-lifecycle state operator (SURVEY.md §2A A7/A8/A13/A16).

The streaming form of the reference's Mongo-backed keyed state
(``/root/reference/ess_client.py:157-163``): per key, an alert is
*open* after an open-state event and *closed* by any other (terminal)
event — the reference's intended delete-on-any-non-started semantics
(SURVEY.md §0.2(1), the always-truthy ``or 'cancelled'`` quirk made
precise). TTL (``ess_client.py:100-110``, 5400 s) is event-time based
here — epoch arithmetic on the event column, fixing the naive-utcnow
bug (§0.2(5)) — and, unlike the reference's startup-only capped purge,
it is enforced *continuously*: a key that goes silent past the TTL
horizon is evicted from the state store and emits a ``closed``
tombstone, so state is bounded by the keys active within one TTL
window, never by total key cardinality.

Implementation: ``applyInPandasWithState`` with
``GroupStateTimeout.EventTimeTimeout`` — per-key GroupState holding
``(state, last_ts_us, last_seq)``.  Three invariants:

1. **Last-writer-wins by event order, not arrival order.** Every
   transition compares the batch's newest event ``(ts_us, seq)``
   against the stored pair and ignores anything older — so a late
   microbatch carrying an out-of-order terminal event cannot close an
   alert that a newer event re-opened. The fold is deterministic for
   any microbatch partitioning of the same event multiset (within the
   watermark horizon).
2. **Tombstone retention.** Terminal events *record* the closed state
   (rather than dropping it immediately) so invariant 1 also holds
   against late older *open* events; the tombstone itself is evicted by
   the TTL timeout, keeping state bounded.
3. **TTL eviction** (A13): each update arms an event-time timeout at
   ``last event time + ttl``; when the watermark passes it the key is
   removed, emitting ``closed`` if the alert was still open — the
   continuous, uncapped form of the reference's startup purge.

Spark 4's ``transformWithStateInPandas`` (ValueState + native
``TTLConfig``) is the forward path with identical semantics, but its
state-server protocol needs ``google.protobuf``, which this container
doesn't ship — the wrapper would swap one method call and the
processor shape.

Scale notes (100 TB): state size is O(keys seen within one TTL
window) — closed and silent keys are both evicted by the event-time
timeout. The operator shuffles once on the key; RocksDB state store +
changelog checkpointing is the production configuration (set by
:func:`configure_state_store`).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: reference TTL: ess_client.py:102
TTL_SECONDS = 5400

OUTPUT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("state", StringType()),
        StructField("last_ts_us", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("state", StringType()),
        StructField("last_ts_us", LongType()),
        StructField("last_seq", LongType()),
    ]
)


def configure_state_store(spark: SparkSession) -> None:
    """Pin the RocksDB state store provider — state off-heap with
    changelog checkpointing, the provider that holds up when live-key
    cardinality is millions."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )


def make_lifecycle_fn(open_state: str, ttl_seconds: int = TTL_SECONDS):
    """Build the per-key state-transition function.

    Rows within a batch are applied in ``(ts_us, seq)`` order and
    compared against the stored ``(last_ts_us, last_seq)``, so the fold
    is deterministic regardless of microbatch boundaries or shuffle
    arrival order (module invariants 1-2). Emits the key's post-batch
    status: ``open`` (with the opening event time) or ``closed`` (a
    tombstone the upsert sink turns into a delete — ``Alert.remove``,
    services/AlertService.py:78-88). A key silent past the TTL emits
    ``closed`` on timeout and its state is removed (invariant 3).
    """
    ttl_ms = ttl_seconds * 1_000

    def lifecycle(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # TTL eviction: the continuous form of the reference's
            # startup purge (ess_client.py:100-110). Emit the tombstone
            # only if the alert was still open; closed tombstones just
            # age out silently.
            stored, stored_ts_us, _seq = state.get
            state.remove()
            if stored == "open":
                yield pd.DataFrame(
                    {
                        "id": [key[0]],
                        "state": ["closed"],
                        "last_ts_us": [int(stored_ts_us)],
                    }
                )
            return

        events = pd.concat(list(pdfs), ignore_index=True)
        events = events.sort_values(["ts_us", "seq"], kind="mergesort")
        last = events.iloc[-1]
        last_ts_us, last_seq = int(last["ts_us"]), int(last["seq"])

        if state.exists:
            _stored, stored_ts_us, stored_seq = state.get
            if (last_ts_us, last_seq) < (int(stored_ts_us), int(stored_seq)):
                # Entire batch is older than the applied event: a late
                # out-of-order remnant. Ignore it (invariant 1) but
                # re-arm the timeout for the *applied* event.
                _arm_timeout(state, int(stored_ts_us) // 1000, ttl_ms)
                return

        out = "open" if last["state"] == open_state else "closed"
        state.update((out, last_ts_us, last_seq))
        _arm_timeout(state, last_ts_us // 1000, ttl_ms)
        yield pd.DataFrame(
            {
                "id": [key[0]],
                "state": [out],
                "last_ts_us": [last_ts_us],
            }
        )

    return lifecycle


def _arm_timeout(state: GroupState, event_ms: int, ttl_ms: int) -> None:
    """Arm the event-time timeout at ``event time + TTL``, clamped just
    past the current watermark (Spark rejects timeouts at/behind it —
    possible when a nearly-expired key is refreshed by a late event)."""
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(event_ms + ttl_ms, wm + 1))


def open_alerts_stream(
    events: DataFrame,
    *,
    key_col: str = "id",
    state_col: str = "state",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    open_state: str = "started",
    ttl_seconds: int = TTL_SECONDS,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Wire a (streaming) event DataFrame through the lifecycle
    operator: per-key state transitions keyed by ``key_col`` with event
    order ``(ts, seq)``, out-of-order protection within
    ``watermark_delay``, and TTL eviction after ``ttl_seconds`` of
    event-time silence.

    Returns the change stream ``(id, state ∈ {open, closed},
    last_ts_us)``; feed it to an upsert sink
    (:mod:`streamclient_spark.streaming.sinks`) to materialize the
    open-alerts table — the oracle-checked batch analog is
    ``q_state_open``.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        F.col(key_col).cast("string").alias("id"),
        F.col(state_col).alias("state"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        (F.col(ts_col).cast("double") * 1_000_000).cast("bigint").alias(
            "ts_us"
        ),
        F.col(seq_col).cast("bigint").alias("seq"),
    ).withWatermark("ts", watermark_delay)
    return prepared.groupBy("id").applyInPandasWithState(
        make_lifecycle_fn(open_state, ttl_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def ttl_filter(open_alerts: DataFrame, horizon_ts_us: int) -> DataFrame:
    """Event-time retention (A13) on the *materialized view*: drop
    alerts whose last event is older than the horizon — one pushed-down
    range predicate, the set-based form of the reference's capped
    per-row purge loop (ess_client.py:100-110). The streaming operator
    above additionally evicts such keys from the state store itself."""
    from pyspark.sql import functions as F

    return open_alerts.filter(F.col("last_ts_us") >= horizon_ts_us)
