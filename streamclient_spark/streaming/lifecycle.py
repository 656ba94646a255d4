"""Keyed alert-lifecycle state operator (SURVEY.md §2A A7/A8/A13/A16).

The streaming form of the reference's Mongo-backed keyed state
(``/root/reference/ess_client.py:157-163``): per key, an alert is
*open* after an open-state event and *closed* by any other (terminal)
event — the reference's intended delete-on-any-non-started semantics
(SURVEY.md §0.2(1), the always-truthy ``or 'cancelled'`` quirk made
precise). TTL (``ess_client.py:100-110``, 5400 s) is event-time based
here — epoch arithmetic on the event column, fixing the naive-utcnow
bug (§0.2(5)).

Implementation: ``applyInPandasWithState`` — per-key GroupState holding
``(state, last_ts_us)``; open events update it, terminal events remove
it (``GroupState.remove()`` is literally the A8 delete). Spark 4's
``transformWithStateInPandas`` (ValueState + native ``TTLConfig``) is
the forward path with identical semantics, but its state-server
protocol needs ``google.protobuf``, which this container doesn't ship —
the wrapper would swap one method call and the processor shape.

Scale notes (100 TB): state size is O(live keys), not O(events) —
closed keys delete their state. The operator shuffles once on the key;
RocksDB state store + changelog checkpointing is the production
configuration (set by :func:`configure_state_store`).
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


def make_lifecycle_fn(open_state: str):
    """Build the per-key state-transition function.

    Rows within a batch are applied in ``(ts_us, seq)`` order, so the
    fold is deterministic regardless of microbatch boundaries or
    shuffle arrival order. Emits the key's post-batch status: ``open``
    (with the opening event time) or ``closed`` (a tombstone the upsert
    sink turns into a delete — ``Alert.remove``,
    services/AlertService.py:78-88).
    """

    def lifecycle(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        events = pd.concat(list(pdfs), ignore_index=True)
        events = events.sort_values(["ts_us", "seq"], kind="mergesort")
        last = events.iloc[-1]
        if last["state"] == open_state:
            state.update((open_state, int(last["ts_us"])))
            out = "open"
        else:
            if state.exists:
                state.remove()
            out = "closed"
        yield pd.DataFrame(
            {
                "id": [key[0]],
                "state": [out],
                "last_ts_us": [int(last["ts_us"])],
            }
        )

    return lifecycle


def open_alerts_stream(
    events: DataFrame,
    *,
    key_col: str = "id",
    state_col: str = "state",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    open_state: str = "started",
) -> DataFrame:
    """Wire a (streaming) event DataFrame through the lifecycle
    operator: per-key state transitions keyed by ``key_col`` with event
    order ``(ts, seq)``.

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
        (F.col(ts_col).cast("double") * 1_000_000).cast("bigint").alias(
            "ts_us"
        ),
        F.col(seq_col).cast("bigint").alias("seq"),
    )
    return prepared.groupBy("id").applyInPandasWithState(
        make_lifecycle_fn(open_state),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ttl_filter(open_alerts: DataFrame, horizon_ts_us: int) -> DataFrame:
    """Event-time retention (A13): drop alerts whose last event is older
    than the horizon — one pushed-down range predicate, the set-based
    form of the reference's capped per-row purge loop
    (ess_client.py:100-110)."""
    from pyspark.sql import functions as F

    return open_alerts.filter(F.col("last_ts_us") >= horizon_ts_us)
