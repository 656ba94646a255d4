"""Stream-stream and stream-static joins (SURVEY.md §2B B-T6).

Wrappers over Structured Streaming's joins with the watermark plumbing
spelled out, because the watermarks are the semantics:

- **stream-static**: the streaming side probes a batch dimension table;
  no state, no watermark needed. Broadcast the dim (same rule as
  ``q_join_broadcast``).
- **stream-stream inner**: both sides buffer rows in state until the
  watermark plus the join's event-time bound allows eviction; without
  the time-range condition state grows forever. The bound below is a
  ``[left.ts, left.ts + window]`` range on the right side.

Scale notes (100 TB): stream-stream join state is the product of the
per-key event rate and the time bound — keep the bound tight. Both
sides shuffle on the join key; a hot key needs salting upstream (the
state store itself cannot be salted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_join(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """B-T6 (stream-static): enrich a stream against a batch dimension.
    The dim is broadcast — no shuffle of the stream, no state. CALLER
    CONTRACT: ``dim`` must be a genuinely bounded dimension (lookup /
    config / codebook tables); for a fact-scaled static side, drop the
    hint and let each microbatch's AQE pick the join strategy."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    window: str = "15 minutes",
) -> DataFrame:
    """B-T6 (stream-stream inner): equi-join on ``key`` with an
    event-time range bound ``right.ts ∈ [left.ts, left.ts + window]``.
    Both watermarks plus the bound let Spark evict buffered state."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {window}")
        )
    )
    return lw.join(rw, cond, "inner")
