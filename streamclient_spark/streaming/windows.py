"""Event-time windowed aggregation wrappers (SURVEY.md §2B B-T1..B-T4).

Thin, typed wrappers over Structured Streaming's window operators so
each B-T row of the survey has one named, tested entry point. All of
them work identically on batch DataFrames (Spark's unified semantics),
which is how the oracle-checked batch analogs (``q_win_tumbling``,
``q_win_session``, ``q_dedup_exact``) pin their logic.

Scale notes (100 TB): windowed aggregation state is bounded by the
watermark — late data past it is dropped and closed windows are
evicted. The shuffle key is (window, group key); skewed hot keys are
handled by AQE or key salting upstream. Session windows merge on
overlap, so state per key is O(open sessions), not O(events).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_watermark(
    events: DataFrame, ts_col: str = "ts", delay: str = "10 minutes"
) -> DataFrame:
    """B-T3: bound event-time lateness. Rows later than ``delay`` behind
    the max observed event time are dropped by downstream stateful ops;
    this is what makes their state finite."""
    return events.withWatermark(ts_col, delay)


def tumbling_counts(
    events: DataFrame,
    *aggs: Column,
    ts_col: str = "ts",
    width: str = "10 minutes",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """B-T1: fixed-width non-overlapping windows. Defaults to row
    counts; extra aggregate columns pass through ``*aggs``."""
    keys = [F.window(ts_col, width).alias("win"), *group_cols]
    agg_exprs = list(aggs) or [F.count(F.lit(1)).alias("n_events")]
    out = events.groupBy(*keys).agg(*agg_exprs)
    agg_cols = [c for c in out.columns if c != "win" and c not in group_cols]
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *group_cols,
        *agg_cols,
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    width: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """B-T1 (sliding): overlapping windows — each event lands in
    width/slide windows; the shuffled row count multiplies accordingly
    (keep the ratio small at scale)."""
    return (
        events.groupBy(F.window(ts_col, width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
        )
    )


def session_windows(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """B-T2: per-key sessions — windows extend while successive events
    arrive within ``gap``; batch analog (gaps-and-islands SQL) is the
    oracle for ``q_win_session``."""
    return (
        events.groupBy(
            F.col(key_col), F.session_window(ts_col, gap).alias("sess")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            key_col,
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: tuple[str, ...],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """B-T4: streaming exact dedup — drop repeats of ``keys`` within the
    watermark window (state for a key is released once the watermark
    passes it; unbounded-history dedup would hold unbounded state)."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
