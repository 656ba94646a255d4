"""Injectable live-event transport for the streaming source's live mode.

The reference's live source is a websocket subscription that pushes
typed game events (``/root/reference/ess_client.py:121-124`` — the
``auraxium`` client owns connect/subscribe/heartbeat). A raw push
socket cannot give a distributed engine replayable offsets, so every
production-grade Spark source puts a *journal* between the wire and the
engine (exactly what Kafka is). The transport contract here models
that journal:

- **shards**: the stream is split into independent, ordered shards
  (one websocket subscription / one broker partition each); Spark maps
  one input partition per shard per microbatch, so ingest parallelism
  = shard count — this is what makes the live source scale past the
  reference's single-socket, single-thread design.
- **offsets**: per-shard monotone sequence numbers. ``latest()`` is
  the driver-side control-plane poll; ``fetch(shard, lo, hi)`` is an
  idempotent executor-side range read — the same range always returns
  the same events, which is what checkpoint replay (effectively-once)
  requires.
- **subscription pushdown**: the transport is constructed with the
  subscribed event types, so filtering happens source-side (the
  analog of the reference's ``@client.trigger(event.MetagameEvent)``
  server-side subscription). Offsets index journal positions, not
  delivered rows — filtering never disturbs replay.

A transport is injected as an option ``transport='pkg.module:factory'``
(a picklable indirection: executors re-resolve the factory from the
option string, never pickle a live connection). The in-repo
:func:`file_journal_transport` is the test double: each shard is a
JSONL journal file; a real deployment would back the same 3-method
contract with a websocket-fed broker or log store.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from typing import Iterable, Protocol


class LiveEventTransport(Protocol):
    """Offset-addressable sharded event journal (see module doc)."""

    def latest(self) -> dict[int, int]:
        """Per-shard end offset (exclusive): {shard: next_seq}."""
        ...

    def fetch(self, shard: int, lo: int, hi: int) -> Iterable[tuple]:
        """Idempotent range read of one shard, rows in EVENT_SCHEMA
        column order, subscription filter applied."""
        ...


def resolve_transport(options: dict) -> LiveEventTransport:
    """Instantiate the transport named by the ``transport`` option
    (``'pkg.module:factory'``); the factory receives the full option
    dict. String indirection keeps partitions picklable."""
    spec = options.get("transport")
    if not spec:
        raise ValueError(
            "live mode requires a transport='module:factory' option "
            "(e.g. streamclient_spark.sources.transport:"
            "file_journal_transport)"
        )
    modname, _, attr = spec.partition(":")
    import importlib

    factory = getattr(importlib.import_module(modname), attr)
    return factory(options)


class FileJournalTransport:
    """Test-double journal: shard *k* is ``<dir>/shard-<k>.jsonl``, one
    JSON event per line; the line number is the sequence offset.
    Appends model live arrival; range reads are idempotent by
    construction. Event fields: event_id, ts (epoch seconds), user_id,
    event_type, value, props."""

    def __init__(self, journal_dir: str, event_types: frozenset[str] | None):
        self._dir = journal_dir
        self._types = event_types

    def _shard_path(self, shard: int) -> str:
        return os.path.join(self._dir, f"shard-{shard}.jsonl")

    def _shards(self) -> list[int]:
        if not os.path.isdir(self._dir):
            return []
        out = []
        for name in os.listdir(self._dir):
            if name.startswith("shard-") and name.endswith(".jsonl"):
                out.append(int(name[len("shard-") : -len(".jsonl")]))
        return sorted(out)

    def latest(self) -> dict[int, int]:
        ends = {}
        for shard in self._shards():
            with open(self._shard_path(shard), "rb") as f:
                ends[shard] = sum(1 for line in f if line.strip())
        return ends

    def fetch(self, shard: int, lo: int, hi: int) -> Iterable[tuple]:
        with open(self._shard_path(shard), "rb") as f:
            for seq, line in enumerate(f):
                if seq >= hi:
                    break
                if seq < lo or not line.strip():
                    continue
                e = json.loads(line)
                if self._types and e["event_type"] not in self._types:
                    continue  # subscription pushdown; offset still counts
                yield (
                    int(e["event_id"]),
                    datetime.fromtimestamp(float(e["ts"]), tz=timezone.utc),
                    int(e["user_id"]),
                    str(e["event_type"]),
                    float(e["value"]),
                    json.dumps(e.get("props"))
                    if not isinstance(e.get("props"), (str, type(None)))
                    else e.get("props"),
                )


class WebsocketJournalFeeder:
    """Socket→journal adapter: drains a websocket-style push client
    into the sharded JSONL journal that :class:`FileJournalTransport`
    reads — the wire side of the transport contract, modeled on the
    reference's ESS subscription (``/root/reference/ess_client.py:
    121-124``: connect, subscribe by event type, receive pushed JSON
    frames, ignore heartbeats).

    The socket client is INJECTED — any object with ``connect()``,
    ``send(text)``, ``recv() -> str | None`` (one text frame; ``None``
    on close), ``close()``. Production would hand a real websocket
    wrapper; tests hand a scripted fake — the sandbox has no network,
    so this adapter is shape-complete and unit-tested against the
    fake, never against a live socket.

    Frame protocol (the reference's event-stream shape):

    - ``{"type": "heartbeat", ...}`` and any frame without a
      ``payload`` are control noise — skipped;
    - ``{"service": "event", "type": "serviceMessage", "payload":
      {event fields...}}`` is one pushed event.

    Each event appends one JSON line to ``shard-<k>.jsonl`` where
    ``k = user_id mod n_shards`` — a deterministic, key-affine routing
    so one user's events stay ordered within one shard (the property
    the per-shard offset contract needs). Appends flush per event so a
    concurrently-running live source sees the tail grow. Subscription
    pushdown happens in BOTH directions: the subscribe frame carries
    the requested event types (server-side, like the reference's
    trigger registration), and delivered frames are re-checked locally
    (defense against an over-delivering server).
    """

    def __init__(
        self,
        socket_client,
        journal_dir: str,
        n_shards: int = 4,
        event_types: frozenset[str] | None = None,
    ):
        self._sock = socket_client
        self._dir = journal_dir
        self._n_shards = n_shards
        self._types = event_types
        #: events dropped for lack of a routable key (missing or
        #: non-numeric user_id). Exposed so supervisors can alert on
        #: upstream key regressions instead of seeing silent data loss
        #: (ADVICE r5); a rate-limited WARN fires alongside.
        self.dropped_unroutable = 0

    def _subscribe_frame(self) -> str:
        return json.dumps(
            {
                "service": "event",
                "action": "subscribe",
                "eventNames": sorted(self._types) if self._types else ["all"],
            }
        )

    def run(self, max_events: int | None = None) -> int:
        """Drain the socket into the journal; returns events written.
        Stops on socket close (``recv() -> None``) or after
        ``max_events`` events (tests use the bound; a production
        feeder runs until the socket dies and is then restarted by its
        supervisor — journal appends are idempotent-safe because every
        event lands exactly once per received frame)."""
        os.makedirs(self._dir, exist_ok=True)
        self._sock.connect()
        self._sock.send(self._subscribe_frame())
        written = 0
        files = {}
        try:
            while max_events is None or written < max_events:
                frame = self._sock.recv()
                if frame is None:
                    break
                try:
                    msg = json.loads(frame)
                except (ValueError, TypeError):
                    continue  # malformed frame: drop, never crash ingest
                payload = msg.get("payload")
                if not isinstance(payload, dict):
                    continue  # heartbeat / subscription echo / control
                etype = payload.get("event_type")
                if self._types and etype not in self._types:
                    continue  # local re-check of the subscription
                uid = payload.get("user_id")
                try:
                    shard = int(uid) % self._n_shards
                except (TypeError, ValueError):
                    # no routable key: drop, never crash ingest — but
                    # COUNT it and warn on a power-of-two / per-1000
                    # cadence so upstream key regressions surface as a
                    # signal, not as unexplained loss (ADVICE r5)
                    self.dropped_unroutable += 1
                    n = self.dropped_unroutable
                    if n & (n - 1) == 0 or n % 1000 == 0:
                        import logging

                        logging.getLogger(__name__).warning(
                            "dropped %d event(s) with missing/"
                            "non-numeric user_id (latest event_type=%r)",
                            n,
                            etype,
                        )
                    continue

                if shard not in files:
                    files[shard] = open(
                        os.path.join(self._dir, f"shard-{shard}.jsonl"),
                        "a",
                        encoding="utf-8",
                    )
                f = files[shard]
                f.write(json.dumps(payload) + "\n")
                f.flush()  # live readers tail the journal
                written += 1
        finally:
            for f in files.values():
                f.close()
            self._sock.close()
        return written


def file_journal_transport(options: dict) -> FileJournalTransport:
    """Factory for :class:`FileJournalTransport`; options:
    ``journal_dir`` (required), ``event_type`` (comma-separated
    subscription filter, optional)."""
    types = options.get("event_type")
    return FileJournalTransport(
        options["journal_dir"],
        frozenset(t.strip() for t in types.split(",")) if types else None,
    )
