"""Structured Streaming operators: lifecycle state, windows, sinks,
and the end-to-end pipeline assembler (SURVEY.md §2A streaming form,
§2B B-T*)."""

from streamclient_spark.streaming.bus import (
    amqp_publisher_factory,
    kafka_sink,
)
from streamclient_spark.streaming.lifecycle import (
    configure_state_store,
    make_lifecycle_fn,
    open_alerts_stream,
    ttl_filter,
)
from streamclient_spark.streaming.pipeline import (
    PipelineMetrics,
    metagame_pipeline,
    project_events,
)
from streamclient_spark.streaming.sinks import (
    bus_sink_batch,
    compact_rollup,
    read_rollup,
    rollup_sink_batch,
    collecting_publisher_factory,
    read_published,
    read_scd2_asof,
    read_state_store,
    scd2_sink_batch,
    to_wire,
    upsert_state_batch,
)
from streamclient_spark.streaming.windows import (
    dedup_stream,
    session_windows,
    sliding_counts,
    tumbling_counts,
    with_watermark,
)

__all__ = [
    "PipelineMetrics",
    "amqp_publisher_factory",
    "bus_sink_batch",
    "kafka_sink",
    "collecting_publisher_factory",
    "compact_rollup",
    "read_rollup",
    "rollup_sink_batch",
    "configure_state_store",
    "read_published",
    "dedup_stream",
    "make_lifecycle_fn",
    "metagame_pipeline",
    "open_alerts_stream",
    "project_events",
    "read_scd2_asof",
    "read_state_store",
    "scd2_sink_batch",
    "session_windows",
    "sliding_counts",
    "to_wire",
    "ttl_filter",
    "tumbling_counts",
    "upsert_state_batch",
    "with_watermark",
]
