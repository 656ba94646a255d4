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


def file_journal_transport(options: dict) -> FileJournalTransport:
    """Factory for :class:`FileJournalTransport`; options:
    ``journal_dir`` (required), ``event_type`` (comma-separated
    subscription filter, optional)."""
    types = options.get("event_type")
    return FileJournalTransport(
        options["journal_dir"],
        frozenset(t.strip() for t in types.split(",")) if types else None,
    )
