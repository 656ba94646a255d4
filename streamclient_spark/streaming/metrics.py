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

- **exposition** (:class:`MetricsHttpServer`) serves the whole set in
  Prometheus text format over HTTP from a daemon thread — the analog
  of the reference's ``start_http_server(METRICS_PORT)``
  (``ess_client.py:170-172``), stdlib-only.

Scale notes: listeners run on the driver and must stay O(1) per batch —
this one keeps only the latest snapshot per query plus bounded
counters; the HTTP endpoint renders that bounded snapshot on demand
(no per-event work), so scrape cost is independent of event rate.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

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


# ---------------------------------------------------------------------------
# Prometheus-format HTTP exposition (A17 operational surface)
# ---------------------------------------------------------------------------


def _esc(v: str) -> str:
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace(
        "\n", "\\n"
    )


def render_prometheus(
    listener: MetricsListener,
    in_progress: Optional[Callable[[], int]] = None,
) -> str:
    """Render the listener snapshot in Prometheus text exposition
    format. Metric names mirror the reference's registry
    (``ess_client.py:45-69``): ``total_events`` counter,
    ``last_event_time`` gauge (event-time max via ``observe``, fixing
    the set-on-arrival quirk §0.2(3)), ``in_progress_alerts`` gauge
    (the metric the reference declared but never updated — supplied
    here by a caller-provided store-count callable, A16), and the
    per-query service-state enum."""
    lines: list[str] = []
    totals = listener.totals()
    lines.append("# TYPE total_events counter")
    lines.append(f"total_events {totals['input_rows']}")
    lines.append("# TYPE streaming_batches_total counter")
    lines.append(f"streaming_batches_total {totals['batches']}")
    lines.append("# TYPE streaming_queries gauge")
    lines.append(f"streaming_queries {totals['queries']}")

    last_ts: Optional[float] = None
    for m in listener.snapshot().values():
        for row in m.observed.values():
            ts = row.get("max_ts")
            if ts is not None:
                epoch = ts.timestamp() if hasattr(ts, "timestamp") else float(ts)
                last_ts = epoch if last_ts is None else max(last_ts, epoch)
    if last_ts is not None:
        lines.append("# TYPE last_event_time gauge")
        lines.append(f"last_event_time {last_ts}")

    if in_progress is not None:
        lines.append("# TYPE in_progress_alerts gauge")
        lines.append(f"in_progress_alerts {int(in_progress())}")

    lines.append("# TYPE query_state gauge")
    lines.append("# TYPE query_input_rows counter")
    lines.append("# TYPE query_batches counter")
    for qid, m in listener.snapshot().items():
        name = _esc(m.name or qid)
        for state in ("starting", "running", "stopped"):
            flag = 1 if m.state == state else 0
            lines.append(
                f'query_state{{query="{name}",state="{state}"}} {flag}'
            )
        lines.append(f'query_input_rows{{query="{name}"}} {m.input_rows}')
        lines.append(f'query_batches{{query="{name}"}} {m.batches}')
    return "\n".join(lines) + "\n"


class MetricsHttpServer:
    """Serve ``/metrics`` in Prometheus text format from a daemon
    thread — the reference's ``start_http_server`` analog. ``port=0``
    binds an ephemeral port (read it from ``.port`` after
    :meth:`start`); ``in_progress`` supplies the A16 gauge (typically
    ``lambda: read_state_store(spark, path).count()``, invoked only on
    scrape)."""

    def __init__(
        self,
        listener: MetricsListener,
        port: int = 0,
        in_progress: Optional[Callable[[], int]] = None,
    ) -> None:
        self._listener = listener
        self._want_port = port
        self._in_progress = in_progress
        self._server: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None
        self.port: Optional[int] = None

    def start(self) -> int:
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                if self.path.rstrip("/") not in ("", "/metrics"):
                    self.send_response(404)
                    self.end_headers()
                    return
                body = render_prometheus(
                    outer._listener, outer._in_progress
                ).encode("utf-8")
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a) -> None:  # silence per-scrape logs
                pass

        self._server = ThreadingHTTPServer(
            ("127.0.0.1", self._want_port), Handler
        )
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None
