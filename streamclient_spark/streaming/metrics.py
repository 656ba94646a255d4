"""Streaming observability (SURVEY.md §2A A14/A15/A16/A17).

The reference exposes Prometheus metrics: an event counter, a
last-event-time gauge, an (intended) in-progress-alerts gauge, and
service state enums (``/root/reference/ess_client.py:45-69``). The
Spark-native equivalents:

- **per-batch data metrics** come from ``DataFrame.observe`` (the
  pipeline assembler attaches count / max event-time — A14/A15, with
  the gauge computed as an event-time ``max`` rather than
  set-on-arrival, fixing §0.2(3));
- **query/service state** comes from a ``StreamingQueryListener``
  (started / progress / terminated — the analog of the reference's
  starting/running/stopped enums, A17);
- **in-progress alerts** (A16) is a count over the materialized state
  store (``read_state_store(...).count()``) — the value the reference
  declared but never wired up.

Scale notes: listeners run on the driver and must stay O(1) per batch —
this one keeps only the latest snapshot per query plus bounded
counters. Export to a real metrics registry is a sink-side concern
(wire ``MetricsListener.snapshot()`` into whatever scraper runs beside
the driver).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql.streaming.listener import (
    QueryProgressEvent,
    QueryStartedEvent,
    QueryTerminatedEvent,
    StreamingQueryListener,
)


@dataclass
class QueryMetrics:
    """Latest snapshot for one streaming query (gauge semantics)."""

    name: Optional[str] = None
    state: str = "starting"  # starting → running → stopped (A17 enum)
    batches: int = 0
    input_rows: int = 0
    observed: dict = field(default_factory=dict)
    last_error: Optional[str] = None


class MetricsListener(StreamingQueryListener):
    """Driver-side listener: service-state enum + running counters per
    query, including any ``observe()`` metrics attached upstream."""

    def __init__(self) -> None:
        self._queries: dict[str, QueryMetrics] = {}

    # -- listener callbacks -------------------------------------------------

    def onQueryStarted(self, event: QueryStartedEvent) -> None:
        m = self._queries.setdefault(str(event.id), QueryMetrics())
        m.name = event.name
        m.state = "running"

    def onQueryProgress(self, event: QueryProgressEvent) -> None:
        p = event.progress
        m = self._queries.setdefault(str(p.id), QueryMetrics())
        m.state = "running"
        m.batches += 1
        m.input_rows += int(p.numInputRows)
        for obs_name, row in (p.observedMetrics or {}).items():
            m.observed[obs_name] = row.asDict()

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    def onQueryTerminated(self, event: QueryTerminatedEvent) -> None:
        m = self._queries.setdefault(str(event.id), QueryMetrics())
        m.state = "stopped"
        m.last_error = event.exception

    # -- read-out -----------------------------------------------------------

    def snapshot(self) -> dict[str, QueryMetrics]:
        return dict(self._queries)

    def totals(self) -> dict[str, int]:
        return {
            "queries": len(self._queries),
            "batches": sum(m.batches for m in self._queries.values()),
            "input_rows": sum(m.input_rows for m in self._queries.values()),
        }


def attach(spark: SparkSession) -> MetricsListener:
    """Register a fresh listener on the session and return it."""
    listener = MetricsListener()
    spark.streams.addListener(listener)
    return listener
