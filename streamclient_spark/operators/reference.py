"""Reference-surface operators, batch form (SURVEY.md §2A).

Each query re-expresses one operator of the reference stream client
(``/root/reference/ess_client.py``, ``services/AlertService.py``) as an
idiomatic Spark DataFrame computation over the ``events`` fixture table
(the batch stand-in for the reference's websocket stream, FIXTURES.md §A).

Mapping of the reference's MetagameEvent domain onto ``events``:

- composite key ``world_id + '-' + instance_id`` (ess_client.py:126)
  → ``user_id + '-' + event_id``;
- lifecycle state ``metagame_event_state_name`` (ess_client.py:136)
  → ``event_type`` (``signup`` plays the role of ``'started'``);
- event time ``evt.timestamp`` (ess_client.py:143) → ``ts``.

Scale notes (100 TB): every query here is a single parquet scan with
filters/projections pushed to the scan, plus at most one shuffle
(the keyed window in ``q_state_open``). On a cluster the events table
would be date-partitioned so the TTL/retention predicates prune whole
partitions, and the per-key window shuffles only the (key, ts, state)
columns after pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load

# TTL in the reference: 5400 s (ess_client.py:102). The fixture events
# span 30 days, so the analog retention horizon is 7 days back from the
# dataset's max event-time (purely event-time arithmetic — fixes the
# naive-utcnow bug, SURVEY.md §0.2(5)).
TTL_DAYS = 7

# ---------------------------------------------------------------------------
# A1 — streaming source, batch analog: full scan of the events table
# ---------------------------------------------------------------------------


@register(
    "q_scan_events",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           value, props
    FROM events
    """,
)
def q_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/B-S1: unbounded source ≅ batch scan (ess_client.py:121-124).

    Columnar parquet scan; Catalyst prunes columns/rows for downstream
    consumers automatically.
    """
    return load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


# ---------------------------------------------------------------------------
# A2 — source-side event-type filter (predicate pushed to the scan)
# ---------------------------------------------------------------------------


@register(
    "q_filter_type",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events WHERE event_type = 'purchase'
    """,
)
def q_filter_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: typed subscription = server-side filter (ess_client.py:124-125).

    The equality predicate lands in the parquet scan's PushedFilters —
    the Spark analog of "other event types never cross the wire".
    """
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# A3 — derived composite key
# ---------------------------------------------------------------------------


@register(
    "q_derive_key",
    oracle="""
    SELECT event_id,
           CAST(user_id AS VARCHAR) || '-' || CAST(event_id AS VARCHAR) AS id
    FROM events
    """,
)
def q_derive_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: UniqueEventId(world_id, instance_id) → 'w-i' string key
    (ess_client.py:126; format inferred per SURVEY.md §0.1)."""
    return load(spark, sf_dir, "events").select(
        "event_id",
        F.concat_ws("-", F.col("user_id"), F.col("event_id")).alias("id"),
    )


# ---------------------------------------------------------------------------
# A4 — projection / rename / cast to the flat record shape
# ---------------------------------------------------------------------------


@register(
    "q_project_rename",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) || '-' || CAST(event_id AS VARCHAR) AS id,
           event_id,
           event_type AS state,
           user_id AS world_id,
           value AS xp,
           CAST(EPOCH(CAST(ts AS TIMESTAMP)) AS DOUBLE) AS "timestamp"
    FROM events
    """,
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: 10-field projection with renames and datetime→POSIX cast
    (ess_client.py:133-144). ``timestamp`` is seconds-with-µs as DOUBLE,
    exactly `evt.timestamp.timestamp()`."""
    e = load(spark, sf_dir, "events")
    return e.select(
        F.concat_ws("-", "user_id", "event_id").alias("id"),
        "event_id",
        F.col("event_type").alias("state"),
        F.col("user_id").alias("world_id"),
        F.col("value").alias("xp"),
        F.col("ts").cast("double").alias("timestamp"),
    )


# ---------------------------------------------------------------------------
# A5 — record → JSON serialization
# ---------------------------------------------------------------------------


@register(
    "q_to_json",
    oracle="""
    SELECT event_id,
           to_json(struct_pack(event_id := event_id,
                               user_id := user_id,
                               event_type := event_type)) AS payload
    FROM events
    """,
)
def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: asdict + json.dumps → to_json(struct(...)) (ess_client.py:147-148).

    Restricted to int/string fields so the two engines' JSON text forms
    agree byte-for-byte (timestamp/float formatting differs by engine).
    """
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_json(F.struct("event_id", "user_id", "event_type")).alias("payload"),
    )


# ---------------------------------------------------------------------------
# A9 — point lookup by key
# ---------------------------------------------------------------------------


@register(
    "q_point_lookup",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    WHERE CAST(user_id AS VARCHAR) || '-' || CAST(event_id AS VARCHAR) = '140-123'
    """,
)
def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: Alert.read_one point lookup (services/AlertService.py:38-48).

    Key literal exists at sf0.01 (the driver's correctness SF). On a
    real deployment the state table is bucketed by key so this is a
    single-bucket scan, not a full scan.
    """
    e = load(spark, sf_dir, "events")
    return e.filter(
        F.concat_ws("-", "user_id", "event_id") == F.lit("140-123")
    ).select("event_id", "ts", "user_id", "event_type", "value")


# ---------------------------------------------------------------------------
# A10 — predicate scan + limit
# ---------------------------------------------------------------------------


@register(
    "q_filter_limit",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE value > 150.0
    ORDER BY event_id LIMIT 100
    """,
)
def q_filter_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: Alert.read_many(length, query) (services/AlertService.py:50-64).

    The reference's cursor cap is order-dependent; we pin a total order
    on the unique ``event_id`` so the selected set is deterministic.
    Catalyst turns this into TakeOrderedAndProject (top-k, no full sort).
    """
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("value") > 150.0)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# A11 — count with predicate
# ---------------------------------------------------------------------------


@register(
    "q_count_where",
    oracle="SELECT COUNT(*) AS n FROM events WHERE event_type = 'click'",
)
def q_count_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: Alert.count(query) (services/AlertService.py:66-76).
    Partial+final count aggregation; the filter is pushed to the scan."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# A12 — bulk delete by predicate ≅ keep-complement rewrite
# ---------------------------------------------------------------------------


@register(
    "q_anti_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE NOT (event_type = 'error' OR value < 50.0)
    """,
)
def q_anti_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: Alert.remove_many(query) (services/AlertService.py:90-100) as
    the set-based keep-complement rewrite — one scan, no per-row
    round-trips (fixes SURVEY.md §0.2(6))."""
    return (
        load(spark, sf_dir, "events")
        .filter(~((F.col("event_type") == "error") | (F.col("value") < 50.0)))
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# A13 — TTL / retention purge (event-time age predicate)
# ---------------------------------------------------------------------------


@register(
    "q_ttl_filter",
    oracle=f"""
    WITH mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS m FROM events)
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
    FROM events, mx
    WHERE CAST(ts AS TIMESTAMP) >= m - INTERVAL {TTL_DAYS} DAY
    """,
)
def q_ttl_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: purge_stale_alerts — keep rows younger than the TTL horizon
    (ess_client.py:100-110; 5400 s there, {TTL_DAYS} d here to suit the
    fixture's 30-day span). Set-based, uncapped (fixes §0.2(6)); pure
    event-time arithmetic (fixes §0.2(5)).

    The scalar max(ts) comes from a 1-row subquery broadcast into the
    filter — no shuffle of the fact table. With date-partitioned
    storage this predicate prunes partitions at planning time.
    """
    e = load(spark, sf_dir, "events")
    mx = e.agg(F.max("ts").alias("m"))
    return (
        e.crossJoin(F.broadcast(mx))
        .filter(F.col("ts") >= F.col("m") - F.expr(f"INTERVAL {TTL_DAYS} DAYS"))
        .select("event_id", "ts", "user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# A7/A8/A13/A16 — open-alerts derivation (the flagship state query)
# ---------------------------------------------------------------------------


@register(
    "q_state_open",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             row_number() OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
      FROM events
    ),
    mx AS (SELECT max(CAST(ts AS TIMESTAMP)) AS m FROM events)
    SELECT r.user_id AS world_id,
           CAST(r.user_id AS VARCHAR) || '-' || CAST(r.event_id AS VARCHAR) AS id,
           r.event_type AS state,
           r.ts AS last_ts
    FROM ranked r, mx
    WHERE r.rn = 1 AND r.event_type = 'signup'
      AND r.ts >= mx.m - INTERVAL {TTL_DAYS} DAY
    """,
)
def q_state_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+A8+A13 batch analog — the exact set the reference's Mongo
    collection materializes (insert on 'started', delete on terminal,
    TTL purge; ess_client.py:157-163 + :100-110, with the intended
    delete-on-any-terminal semantics per SURVEY.md §0.2(1)).

    Per key: take the latest event by (ts, event_id); the key is open
    iff that event is an open-state event and within the TTL horizon.

    Scale: one hash-shuffle on the key for the window; AQE handles key
    skew. State size is bounded by |live keys|, not |events| — same
    asymptotics as the streaming form (transformWithStateInPandas).
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    mx = e.agg(F.max("ts").alias("m"))
    latest = (
        e.select("user_id", "event_id", "event_type", "ts")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        latest.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("event_type") == "signup")
            & (F.col("ts") >= F.col("m") - F.expr(f"INTERVAL {TTL_DAYS} DAYS"))
        )
        .select(
            F.col("user_id").alias("world_id"),
            F.concat_ws("-", "user_id", "event_id").alias("id"),
            F.col("event_type").alias("state"),
            F.col("ts").alias("last_ts"),
        )
    )


# ---------------------------------------------------------------------------
# A14/A15 — stream metrics, batch analogs
# ---------------------------------------------------------------------------


@register("q_metric_total", oracle="SELECT COUNT(*) AS total_events FROM events")
def q_metric_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: total_events counter (ess_client.py:54-57,130)."""
    return load(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).alias("total_events")
    )


@register(
    "q_metric_last_ts",
    oracle="SELECT max(CAST(ts AS TIMESTAMP)) AS last_event_time FROM events",
)
def q_metric_last_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: last_event_time gauge as max(event-time) (ess_client.py:62-65,
    :131) — the order-independent intended semantics (SURVEY.md §0.2(3))."""
    return load(spark, sf_dir, "events").agg(F.max("ts").alias("last_event_time"))
