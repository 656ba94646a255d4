"""Window-function surface (SURVEY.md §2B rows B-W1..B-W3) plus the
batch analogs of the streaming time-window aggregates (B-T1/B-T2).

Window execution shuffles once on the partition key then sorts within
partitions; all frames below are bounded or running (no re-scan per
row). The streaming forms of B-T1/B-T2 live in
:mod:`streamclient_spark.streaming`; their batch analogs here share the
oracle so the semantics are pinned by the same differential test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from streamclient_spark.compat import dec_sum, sql_dec_sum
from streamclient_spark.plans.registry import register
from streamclient_spark.tables import load

# ---------------------------------------------------------------------------
# B-W1 — ranking functions
# ---------------------------------------------------------------------------


@register(
    "q_win_rank",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey ASC)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-W1: row_number / rank / dense_rank / ntile per nation, ordered
    by balance with a unique tie-break so every function is
    deterministic."""
    s = load(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), F.col("s_suppkey").asc()
    )
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


# ---------------------------------------------------------------------------
# B-W2 — analytic functions (lag/lead/first/last)
# ---------------------------------------------------------------------------


@register(
    "q_win_lag",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           first_value(event_type) OVER w AS first_type,
           CAST(EPOCH(CAST(ts AS TIMESTAMP))
                - EPOCH(lag(CAST(ts AS TIMESTAMP)) OVER w) AS DOUBLE)
             AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP) ASC, event_id ASC)
    """,
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-W2: per-user event sequencing — previous/next event type and
    inter-event gap in seconds (sessionization building block; the
    same shape feeds q_win_session's gaps-and-islands logic)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("event_type").over(w).alias("first_type"),
        (F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)).alias(
            "secs_since_prev"
        ),
    )


# ---------------------------------------------------------------------------
# B-W3 — frames: running sum + moving average
# ---------------------------------------------------------------------------


@register(
    "q_win_frame",
    oracle=f"""
    SELECT user_id, event_id, value,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(*) OVER (
             PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
             AS moving_avg5
    FROM events
    """,
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-W3: running total + 5-row moving average per user. Sums run in
    exact decimal space (compat convention) so the running values are
    bit-identical across engines; the moving average divides by the
    frame's row count, mirrored in the oracle."""
    e = load(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    mov = Window.partitionBy("user_id").orderBy(*order).rowsBetween(-4, 0)
    dec_val = F.col("value").cast("decimal(27,4)")
    return e.select(
        "user_id",
        "event_id",
        "value",
        F.sum(dec_val).over(run).cast("double").alias("running_value"),
        (
            F.sum(dec_val).over(mov).cast("double")
            / F.count(F.lit(1)).over(mov)
        ).alias("moving_avg5"),
    )


# ---------------------------------------------------------------------------
# B-T1 batch analog — tumbling window aggregation
# ---------------------------------------------------------------------------


@register(
    "q_win_tumbling",
    oracle=f"""
    SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dec_sum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-T1 (batch analog): 1-day tumbling event-time windows via
    ``F.window`` — the same operator Structured Streaming uses with a
    watermark; in batch it degenerates to a date_trunc group-by.
    Output exposes window *start* to match the oracle's date_trunc."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# B-T2 batch analog — session windows (gaps-and-islands)
# ---------------------------------------------------------------------------

_SESSION_GAP_MIN = 60  # minutes of inactivity that closes a session


@register(
    "q_win_session",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             CASE WHEN CAST(ts AS TIMESTAMP)
                       - lag(CAST(ts AS TIMESTAMP)) OVER
                         (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                       > INTERVAL {_SESSION_GAP_MIN} MINUTE
                  OR lag(CAST(ts AS TIMESTAMP)) OVER
                         (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
                       IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessioned AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM ordered
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sessioned
    GROUP BY user_id, session_id
    """,
)
def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-T2 (batch analog): session windows with a {_SESSION_GAP_MIN}-min
    inactivity gap, via gaps-and-islands (lag → new-session flag →
    running sum as session id). The streaming twin is
    ``session_window(ts, gap)``; this formulation pins its semantics
    against the oracle. One shuffle on user_id serves both windows and
    the final per-session aggregate."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.expr(f"INTERVAL {_SESSION_GAP_MIN} MINUTES")
    prev_ts = F.lag("ts").over(w)
    return (
        e.select("user_id", "ts", "event_id")
        .withColumn(
            "is_new",
            F.when(prev_ts.isNull() | (F.col("ts") - prev_ts > gap), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("is_new").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# round-2 addition: distribution functions (percent_rank / cume_dist)
# ---------------------------------------------------------------------------


@register(
    "q_win_distribution",
    oracle="""
    SELECT event_id, event_type, value,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cdist
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
    """,
)
def q_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-W1 companion: relative-position distribution functions.
    percent_rank = (rank-1)/(n-1) and cume_dist = rows≤current/n are
    single IEEE divisions over integer window counts — deterministic
    across engines given the unique (value, event_id) total order, so
    the doubles hash-match without a decimal detour. Same execution
    shape as every window here: one shuffle on the partition key, one
    in-partition sort, running computation.

    Scale note: a low-cardinality partition key (5 event types)
    concentrates each key's full population in one task — fine at
    fixture scale, a single-task sort at 100 TB. The scale path for
    *global* distribution ranks is rank-by-range-partitioning: sort by
    (value, id) with a range partitioner, count rows per partition,
    broadcast the per-partition offsets, and compute rank = offset +
    local row number — linear, no single-task sort. The window form
    here is the API-parity surface; the decomposition is what a
    standing 100 TB pipeline would run."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    )


# ---------------------------------------------------------------------------
# round-2 addition: time-series resample (gap fill + forward fill)
# ---------------------------------------------------------------------------

#: resample bucket width: 6 hours in microseconds
_RESAMPLE_US = 21_600_000_000


@register(
    "q_ts_resample",
    oracle=f"""
    WITH b AS (
      SELECT user_id,
             epoch_us(CAST(ts AS TIMESTAMP)) // {_RESAMPLE_US} AS bucket,
             value
      FROM events
    ),
    agg AS (
      SELECT user_id, bucket,
             count(*) AS n_events,
             {sql_dec_sum('value')} AS sum_value
      FROM b GROUP BY user_id, bucket
    ),
    spine AS (
      SELECT user_id,
             unnest(range(min(bucket), max(bucket) + 1)) AS bucket
      FROM agg GROUP BY user_id
    )
    SELECT s.user_id, s.bucket,
           coalesce(a.n_events, 0) AS n_events,
           last_value(a.sum_value IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.bucket) AS ffill_sum
    FROM spine s LEFT JOIN agg a USING (user_id, bucket)
    """,
)
def q_ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: resample each user's event stream
    onto a fixed 6-hour grid — empty buckets materialized (gap fill)
    with the last observed bucket aggregate carried forward (forward
    fill via ``last(..., ignorenulls=True)`` over a running frame).

    Gap rows are derived from the aggregate itself with ``lag``: each
    observed bucket emits the missing buckets since its predecessor
    (codegen ``sequence`` explode) carrying the predecessor's value as
    the fill — so the fill needs no second window pass, no per-user
    min/max branch, and no spine join. ONE events scan, ONE shuffle
    (hash(user_id), which by the subset-key rule also satisfies the
    (user_id, bucket) aggregate and the lag window — EnsureRequirements
    inserts nothing further; plan-asserted). At 100 TB the grid is
    per-entity and spans only each entity's own lifetime — output is
    sum(entity_lifetime)/step rows, not |entities| × |global range|."""
    e = load(spark, sf_dir, "events")
    agg = (
        e.repartition("user_id")
        .select(
            "user_id",
            # integer `div`, never `/`: double division of a ~1.7e15
            # epoch by a non-power-of-2 width can round a boundary
            # timestamp into the wrong bucket
            F.expr(f"unix_micros(ts) div {_RESAMPLE_US}").alias("bucket"),
            "value",
        )
        .groupBy("user_id", "bucket")
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value").alias("sum_value"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("bucket")
    with_prev = agg.select(
        "user_id",
        "bucket",
        "n_events",
        "sum_value",
        F.lag("bucket").over(w).alias("_prev_bucket"),
        F.lag("sum_value").over(w).alias("_prev_sum"),
    )
    # single explode covering the gap run AND the observed bucket —
    # a union of (observed, gaps) branches would scan and shuffle the
    # shared subtree twice (Spark does not reuse common subplans)
    run_start = F.coalesce(F.col("_prev_bucket") + 1, F.col("bucket"))
    at_obs = F.col("b") == F.col("bucket")
    return (
        with_prev.select(
            "user_id", "bucket", "n_events", "sum_value", "_prev_sum",
            F.explode(F.sequence(run_start, F.col("bucket"))).alias("b"),
        )
        .select(
            "user_id",
            F.col("b").alias("bucket"),
            F.when(at_obs, F.col("n_events"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("n_events"),
            F.when(at_obs, F.col("sum_value"))
            .otherwise(F.col("_prev_sum"))
            .alias("ffill_sum"),
        )
    )


@register(
    "q_funnel",
    oracle="""
    WITH clicks AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_click
      FROM events
      WHERE event_type = 'click'
      GROUP BY user_id
    ),
    conv AS (
      SELECT c.user_id,
             MIN(CAST(e.ts AS TIMESTAMP)) AS first_purchase
      FROM events e
      JOIN clicks c
        ON e.user_id = c.user_id
       AND e.event_type = 'purchase'
       AND CAST(e.ts AS TIMESTAMP) > c.first_click
      GROUP BY c.user_id
    )
    SELECT clicks.user_id, first_click, first_purchase,
           (first_purchase IS NOT NULL) AS converted,
           CAST(CASE WHEN first_purchase IS NOT NULL THEN
             date_diff('second', first_click, first_purchase)
           END AS BIGINT) AS secs_to_convert
    FROM clicks LEFT JOIN conv ON clicks.user_id = conv.user_id
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel over the event stream: per user, the first
    ``click`` and the first ``purchase`` that STRICTLY FOLLOWS it —
    the two-step ordered-sequence match every product-analytics engine
    ships (the reference's stream is the same shape: a ``started``
    event followed by a terminal event per key,
    `/root/reference/ess_client.py:157-163`).

    100 TB plan: both event-type filters push to the scan; the
    first-click aggregate is partial+final on the user_id shuffle; the
    follows-the-click condition is a residual on the user_id equi-join
    (never a time-range join); the second aggregate reuses the same
    user_id partitioning (zero extra exchange — Catalyst sees the
    co-partitioning). Timestamps compare exactly (µs truncation both
    engines), so "strictly after" picks identical event sets."""
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("_pu"), F.col("ts").alias("_pts")
    )
    conv = (
        purchases.join(
            clicks,
            (F.col("_pu") == F.col("user_id"))
            & (F.col("_pts") > F.col("first_click")),
        )
        .groupBy(F.col("_pu"))
        .agg(F.min("_pts").alias("first_purchase"))
    )
    return (
        clicks.join(conv, F.col("user_id") == F.col("_pu"), "left")
        .select(
            "user_id",
            "first_click",
            "first_purchase",
            F.col("first_purchase").isNotNull().alias("converted"),
            F.when(
                F.col("first_purchase").isNotNull(),
                (
                    F.unix_timestamp("first_purchase")
                    - F.unix_timestamp("first_click")
                ),
            ).alias("secs_to_convert"),
        )
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS cohort_week
      FROM events
      GROUP BY user_id
    )
    SELECT cohort_week,
           date_trunc('week', CAST(e.ts AS TIMESTAMP)) AS activity_week,
           COUNT(DISTINCT e.user_id) AS active_users,
           COUNT(*) AS n_events
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY cohort_week, activity_week
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week ×
    activity week, with active-user and event counts — the standard
    retention triangle.

    100 TB plan: the first-seen aggregate shuffles once on user_id;
    joining it back reuses that partitioning (co-partitioned join, no
    extra exchange); the (cohort, week) aggregate's COUNT(DISTINCT
    user) expands to a two-phase distinct-aggregate whose first phase
    is also user-keyed — Catalyst chains all three on one
    partitioning. Week truncation is ISO-Monday in both engines
    (date_trunc('week')), on µs-truncated timestamps, so cohort
    boundaries match exactly."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            F.date_trunc("week", F.col("ts")).alias("activity_week"),
        )
        .agg(
            F.count_distinct(F.col("user_id")).alias("active_users"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "q_events_cumulative_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS fts
      FROM events GROUP BY user_id
    ),
    hourly AS (
      SELECT CAST(date_trunc('hour', fts) AS TIMESTAMP) AS hour,
             count(*) AS new_users
      FROM firsts GROUP BY 1
    )
    SELECT hour, CAST(new_users AS BIGINT) AS new_users,
           CAST(sum(new_users) OVER (ORDER BY hour
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_users
    FROM hourly
    """,
)
def q_events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by hour — the growth-curve metric every
    event pipeline reports. A naive running COUNT(DISTINCT) over an
    expanding frame re-scans every prefix (O(days·events)); the
    standard decorrelation is first-touch attribution: each user's
    MIN(ts) marks the single hour they become "new", so hourly counts are a
    plain aggregate and the cumulative curve is a running SUM over
    |hours| rows.

    Plan: one shuffle on user_id (partial-combined min), one tiny
    aggregate on hour, and a running-sum window over the |hours|-row
    result — the unpartitioned window sorts dozens of rows on one
    task, which is exactly where a global window IS the right plan.
    100 TB: identical; the only full-data shuffle is the user_id min,
    and that is the minimum information the metric needs."""
    firsts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fts"))
    )
    hourly = (
        firsts.groupBy(F.date_trunc("hour", "fts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    w = (
        Window.orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return hourly.select(
        "hour",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )

@register(
    "q_events_hourly_rollup",
    oracle="""
    WITH hourly AS (
      SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
               AS hour,
             count(*) AS n,
             SUM(CAST(value AS DECIMAL(27,4))) AS sv,
             max(value) AS mv
      FROM events GROUP BY 1
    )
    SELECT CAST(date_trunc('day', hour) AS TIMESTAMP) AS day,
           CAST(SUM(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_active_hours,
           CAST(SUM(sv) AS DOUBLE) AS total_value,
           MAX(mv) AS max_value
    FROM hourly GROUP BY 1
    """,
)
def q_events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (hypertable / continuous-aggregate
    pattern): daily stats are computed FROM the hourly partial
    aggregate, not from raw events — the materialized-rollup reuse
    every time-series store (TimescaleDB caggs, Druid rollup) is built
    on. Every measure is chosen mergeable: count and max re-aggregate
    exactly, and the value sum stays in exact DECIMAL space until one
    final double conversion, so associativity holds bit-for-bit and
    the two-level result hash-matches the oracle's identical two-level
    formulation (same doctrine as the limb-sum money aggregates).

    Plan: one shuffle keyed by hour (partial+final hash agg over raw
    events), then a second aggregate over |hours| rows — at sf0.1 that
    second level is ~720 rows; at 100 TB the hourly table is still
    only |hours|·|series| rows, which is the entire point of rollup
    reuse: the raw-event shuffle happens once when the hourly
    materialization is maintained incrementally, and every coarser
    granularity (day/week/month) re-aggregates the tiny table."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,4)")).alias("sv"),
            F.max("value").alias("mv"),
        )
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"))
        .agg(
            F.sum("n").alias("n_events"),
            F.count(F.lit(1)).alias("n_active_hours"),
            F.sum("sv").cast("double").alias("total_value"),
            F.max("mv").alias("max_value"),
        )
    )


@register(
    "q_seq_pattern",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_click
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    s2 AS (
      SELECT s1.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_view
      FROM events e JOIN s1
        ON e.user_id = s1.user_id
       AND e.event_type = 'view'
       AND CAST(e.ts AS TIMESTAMP) > s1.t_click
      GROUP BY s1.user_id
    ),
    s3 AS (
      SELECT s2.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
      FROM events e JOIN s2
        ON e.user_id = s2.user_id
       AND e.event_type = 'purchase'
       AND CAST(e.ts AS TIMESTAMP) > s2.t_view
      GROUP BY s2.user_id
    )
    SELECT s1.user_id, t_click, t_view, t_purchase,
           (t_purchase IS NOT NULL) AS completed
    FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
            LEFT JOIN s3 ON s1.user_id = s3.user_id
    """,
)
def q_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence pattern match (MATCH_RECOGNIZE shape): the
    earliest click → view → purchase chain per user, each step
    STRICTLY after the previous — the k-step generalization of
    q_funnel's two-step form, and the greedy-leftmost semantics SQL's
    MATCH_RECOGNIZE calls ``FIRST``. Chained conditional minima ARE
    the scalable formulation: each step is one equi-join on user_id
    with the follows-predicate as a residual plus a partial+final min
    — never a per-user sort or a time-range join — and all three
    steps reuse ONE user_id partitioning (Catalyst sees the
    co-partitioning; zero extra Exchanges after the first).

    At 100 TB: the event-type filters push to the scan, so each step
    reads only its own event class; k-step patterns cost k co-located
    join+agg rounds over ever-shrinking anchor sets. Timestamps
    compare exactly (µs truncation in both engines), so every
    "strictly after" picks identical event sets."""
    ev = load(spark, sf_dir, "events")

    def step(anchor: DataFrame, t_prev: str, etype: str, out: str) -> DataFrame:
        nxt = ev.filter(F.col("event_type") == etype).select(
            F.col("user_id").alias("_u"), F.col("ts").alias("_ts")
        )
        return (
            nxt.join(
                anchor,
                (F.col("_u") == F.col("user_id"))
                & (F.col("_ts") > F.col(t_prev)),
            )
            .groupBy("_u")
            .agg(F.min("_ts").alias(out))
            .select(F.col("_u").alias(f"_{out}_u"), out)
        )

    s1 = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s2 = step(s1, "t_click", "view", "t_view")
    s2j = s1.join(
        s2, F.col("user_id") == F.col("_t_view_u"), "left"
    ).select("user_id", "t_click", "t_view")
    s3 = step(
        s2j.filter(F.col("t_view").isNotNull()), "t_view", "purchase",
        "t_purchase",
    )
    return (
        s2j.join(s3, F.col("user_id") == F.col("_t_purchase_u"), "left")
        .select(
            "user_id",
            "t_click",
            "t_view",
            "t_purchase",
            F.col("t_purchase").isNotNull().alias("completed"),
        )
    )


# ---------------------------------------------------------------------------
# q_win_range_time — event-time RANGE frame (trailing 7-day window)
# ---------------------------------------------------------------------------

_TRAIL_DAYS = 7
_TRAIL_US = _TRAIL_DAYS * 86400 * 1_000_000


@register(
    "q_win_range_time",
    oracle=f"""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) OVER w AS DOUBLE)
             AS trail7d_sum,
           COUNT(*) OVER w AS trail7d_n
    FROM events
    WINDOW w AS (
      PARTITION BY user_id
      ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      RANGE BETWEEN {_TRAIL_US} PRECEDING AND CURRENT ROW)
    """,
)
def q_win_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per-user trailing {_TRAIL_DAYS}-day sum
    and count at every event — the value-based frame (B-W3's ROWS
    frames count rows; RANGE bounds the frame by the *order value*, the
    shape trailing-window features and rate limits need). Ordering is
    epoch microseconds in both engines, so the frame boundary is exact
    and peer rows (equal timestamps) enter the frame together — RANGE
    semantics make the result independent of tie order, no tie-break
    column needed. One shuffle + sort on user_id; the running frame is
    computed in a single pass (Spark's sliding frame keeps a moving
    aggregate, never re-scans). Sums are exact decimal (compat
    convention) cast to double once."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_TRAIL_US, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(27,4)"))
        .over(w)
        .cast("double")
        .alias("trail7d_sum"),
        F.count(F.lit(1)).over(w).alias("trail7d_n"),
    )


# ---------------------------------------------------------------------------
# q_win_ignore_nulls — IGNORE NULLS navigation (forward / backward fill)
# ---------------------------------------------------------------------------


@register(
    "q_win_ignore_nulls",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN event_type = 'purchase' THEN value END AS pv
      FROM events
    )
    SELECT user_id, event_id, pv,
           LAST_VALUE(pv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value,
           FIRST_VALUE(pv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS next_purchase_value
    FROM e
    """,
)
def q_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation: at every event, the most recent
    and the next upcoming purchase value for that user — forward fill
    and backward fill in one pass, the sparse-to-dense gap-bridging
    primitive (sensor carry-forward, price staleness, attribution).
    Pure navigation over running/mirrored frames — no aggregation, so
    raw doubles hash safely; one shuffle + sort on user_id serves both
    directions (the backward fill is the same sorted flow with an
    UNBOUNDED FOLLOWING frame, not a second sort)."""
    e = load(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    back = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fwd = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return e.select(
        "user_id",
        "event_id",
        pv.alias("pv"),
        F.last(pv, ignorenulls=True).over(back).alias("last_purchase_value"),
        F.first(pv, ignorenulls=True).over(fwd).alias("next_purchase_value"),
    )


# ---------------------------------------------------------------------------
# q_ts_wow — period-over-period (week-over-week) change
# ---------------------------------------------------------------------------


@register(
    "q_ts_wow",
    oracle=f"""
    WITH w AS (
      SELECT date_trunc('week', CAST(ts AS TIMESTAMP)) AS week,
             COUNT(*) AS n_events,
             {sql_dec_sum('value')} AS sum_value
      FROM events GROUP BY 1
    )
    SELECT week, n_events, sum_value,
           n_events - lag(n_events) OVER (ORDER BY week) AS wow_events,
           CASE WHEN lag(n_events) OVER (ORDER BY week) IS NULL THEN NULL
                ELSE CAST(FLOOR(
                       CAST((n_events - lag(n_events) OVER (ORDER BY week))
                            * 1000 AS DOUBLE)
                       / lag(n_events) OVER (ORDER BY week)) AS BIGINT)
           END AS wow_permille
    FROM w
    """,
)
def q_ts_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period reporting: weekly event totals with the
    week-over-week absolute delta and integer-permille growth rate —
    the KPI-dashboard staple. The corpus aggregates down to |weeks|
    rows FIRST (one partial/final hash agg); the unpartitioned lag
    window then sorts only that tiny table, so the "global" window is
    harmless at any scale. Growth is exact long permille (floored
    division), never a float ratio; the weekly sum follows the exact-
    decimal convention."""
    e = load(spark, sf_dir, "events")
    w = e.groupBy(
        F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("sum_value"),
    )
    prev = F.lag("n_events").over(Window.orderBy("week"))
    # FLOOR of the double quotient on BOTH engines: Spark's long `div`
    # truncates toward zero while DuckDB's `//` floors — they disagree
    # on negative deltas, so neither is used
    permille = F.floor(
        ((F.col("n_events") - prev) * 1000).cast("double") / prev
    ).cast("long")
    return w.select(
        "week",
        "n_events",
        "sum_value",
        (F.col("n_events") - prev).alias("wow_events"),
        permille.alias("wow_permille"),
    )


# ---------------------------------------------------------------------------
# q_events_markov — event-type transition matrix (first-order chain)
# ---------------------------------------------------------------------------


@register(
    "q_events_markov",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT cur, nxt, count(*) AS n FROM seq
      WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    tot AS (SELECT cur, CAST(SUM(n) AS BIGINT) AS row_n FROM pairs GROUP BY cur)
    SELECT p.cur, p.nxt, p.n,
           CAST(FLOOR(CAST(p.n * 1000 AS DOUBLE) / t.row_n) AS BIGINT)
             AS permille
    FROM pairs p JOIN tot t USING (cur)
    """,
)
def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: for
    every (current, next) event-type pair per user timeline, the count
    and the integer-permille transition probability — the behavioral-
    model / anomalous-flow primitive (a sudden drop in
    click→purchase permille is the alert). One user_id shuffle orders
    the timelines for ``lead``; the pair table is ≤ |types|² rows, so
    the row-normalizing join is trivially broadcast. Probabilities are
    floored integer permille (the explicit-FLOOR convention both
    engines share)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("row_n"))
    return pairs.join(F.broadcast(tot), "cur").select(
        "cur",
        "nxt",
        "n",
        F.floor((F.col("n") * 1000).cast("double") / F.col("row_n"))
        .cast("long")
        .alias("permille"),
    )


# ---------------------------------------------------------------------------
# q_events_attribution — last-touch attribution window (C-151)
# ---------------------------------------------------------------------------


@register(
    "q_events_attribution",
    oracle="""
    WITH o AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN CAST(ts AS TIMESTAMP) END IGNORE NULLS)
               OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP),
                   event_id ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, touch_type, touch_ts,
           CAST(epoch_us(ts) - epoch_us(touch_ts) AS BIGINT) AS lag_us
    FROM o WHERE event_type = 'purchase'
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: every purchase is credited to the same
    user's most recent PRECEDING click or view — the conversion-
    attribution shape (marketing spend, recommendation credit) that
    composes a filtered ``last(..., ignorenulls=True)`` with a frame
    that EXCLUDES the current row (unbounded-preceding → -1), so a
    purchase can never attribute to itself and purchases with no prior
    touch keep NULLs (shown, not dropped — the unattributed-conversion
    rate is itself a KPI). Total order inside a user is (ts, event_id)
    — event_id is unique, so the credited row is deterministic under
    ties. One shuffle on user_id, one sort, one window; the purchase
    filter cannot be pushed below the window (the window must see the
    non-purchase rows) — that ordering IS the semantics. At 100 TB:
    user_id partitions are independent and skew-free (no celebrity
    hubs in per-user activity at this grain); sessionized variants
    bound the frame by a session window first."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("click", "view")
    touched = e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    return touched.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        "touch_type",
        "touch_ts",
        (F.unix_micros("ts") - F.unix_micros("touch_ts")).alias("lag_us"),
    )


# ---------------------------------------------------------------------------
# round-3 additions: gaps-and-islands, rolling anomaly flags, integer EWMA
# ---------------------------------------------------------------------------


@register(
    "q_islands",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ),
    g AS (
      SELECT user_id, day,
             date_diff('day', DATE '1970-01-01', day)
               - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
      FROM d
    )
    SELECT user_id,
           CAST(min(day) AS VARCHAR) AS streak_start,
           CAST(max(day) AS VARCHAR) AS streak_end,
           count(*) AS days
    FROM g GROUP BY user_id, grp
    """,
)
def q_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's maximal runs of CONSECUTIVE
    active days (an "island" = a streak with no missing day inside) —
    the canonical streak/retention shape (login streaks, SLA uptime
    runs, contiguous sensor coverage). The classic constant-difference
    trick: within a user, ``epoch_day − row_number`` is constant
    exactly along a consecutive run, so one window plus one aggregate
    materializes every island without self-joins or loops.

    ONE shuffle total: the explicit hash(user_id) repartition feeds
    the distinct-day aggregate (subset-key rule: hash(user_id)
    clusters (user_id, day) too), the row_number window (same key,
    sort only), and the island aggregate ((user_id, grp) — subset rule
    again). At 100 TB the plan is embarrassingly per-user; no step
    ever sees another user's rows, and days-per-user bounds every
    partition's sort. Streak dates ship as ISO strings: both engines
    render DATE→string identically, while raw DATE columns
    canonicalize differently (Timestamp vs date) in pandas."""
    e = load(spark, sf_dir, "events")
    d = (
        e.repartition("user_id")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.select(
        "user_id",
        "day",
        (
            F.datediff("day", F.lit("1970-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("_grp"),
    )
    return (
        g.groupBy("user_id", "_grp")
        .agg(
            F.min("day").cast("string").alias("streak_start"),
            F.max("day").cast("string").alias("streak_end"),
            F.count(F.lit(1)).alias("days"),
        )
        .select("user_id", "streak_start", "streak_end", "days")
    )


#: trailing-baseline width (rows) for the rolling anomaly detector
_ANOM_BASE = 20


@register(
    "q_ts_anomaly",
    oracle=f"""
    WITH x AS (
      SELECT user_id, event_id,
             CAST(ts AS TIMESTAMP) AS ts,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events
    ),
    w AS (
      SELECT user_id, event_id, xc,
             CAST(count(*) OVER f AS BIGINT) AS n,
             CAST(coalesce(sum(xc) OVER f, 0) AS BIGINT) AS sx,
             CAST(coalesce(sum(xc * xc) OVER f, 0) AS BIGINT) AS sxx
      FROM x
      WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_ANOM_BASE} PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, n AS n_base,
           (n * xc - sx) * (n * xc - sx) AS dev2_num,
           n * sxx - sx * sx AS var_num,
           CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                ELSE (1000 * (n * xc - sx) * (n * xc - sx))
                     // (n * sxx - sx * sx)
           END AS z2_permille
    FROM w
    WHERE n >= 5
      AND (n * xc - sx) * (n * xc - sx) > 9 * (n * sxx - sx * sx)
    """,
)
def q_ts_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags: an event is anomalous when its
    value deviates from the mean of the user's previous ≤20 events by
    more than 3 trailing standard deviations — the standard streaming
    outlier monitor, expressed so both engines agree BIT-EXACTLY. The
    z² > 9 test is evaluated with cleared denominators over exact
    integer cents (dev²·1 > 9·var numerators; n ≤ 21, cents ≤ 5.7e4 →
    every product < 2e15, comfortably int64), so there is no float
    comparison to flap; the reported z² ships as a floored permille
    integer. A zero-variance baseline with a deviating point is an
    anomaly with NULL z² (infinite z).

    The trailing frame EXCLUDES the current row (−20 → −1): the point
    under test must not contaminate its own baseline. Total order
    inside a user is (ts, event_id) — deterministic under ts ties.
    ONE shuffle (hash(user_id)), one sort, one bounded frame that
    Spark evaluates incrementally; at 100 TB per-user partitions are
    independent and the frame never re-scans. Mirrors the reference's
    monitor loop (ess_client.py keeps per-character gauges) as a batch
    analytic."""
    e = load(spark, sf_dir, "events").repartition("user_id")
    fw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ANOM_BASE, -1)
    )
    xc = F.round(F.col("value") * 100).cast("long")
    b = e.select(
        "user_id",
        "event_id",
        xc.alias("xc"),
        F.count(F.lit(1)).over(fw).alias("n"),
        F.coalesce(F.sum(xc).over(fw), F.lit(0)).alias("sx"),
        F.coalesce(F.sum(xc * xc).over(fw), F.lit(0)).alias("sxx"),
    )
    dev2 = (F.col("n") * F.col("xc") - F.col("sx")) * (
        F.col("n") * F.col("xc") - F.col("sx")
    )
    var_num = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        b.select(
            "user_id",
            "event_id",
            F.col("n").alias("n_base"),
            dev2.alias("dev2_num"),
            var_num.alias("var_num"),
        )
        .filter(
            (F.col("n_base") >= 5)
            & (F.col("dev2_num") > 9 * F.col("var_num"))
        )
        .withColumn(
            "z2_permille",
            F.when(F.col("var_num") == 0, F.lit(None).cast("long")).otherwise(
                F.expr("(1000 * dev2_num) div var_num")
            ),
        )
    )


@register(
    "q_ts_ewma",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id,
             CAST(ts AS TIMESTAMP) AS ts,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events
    ),
    l AS (
      SELECT user_id, event_id, xc,
             row_number() OVER w AS rn,
             lag(xc, 1) OVER w AS x1, lag(xc, 2) OVER w AS x2,
             lag(xc, 3) OVER w AS x3, lag(xc, 4) OVER w AS x4,
             lag(xc, 5) OVER w AS x5, lag(xc, 6) OVER w AS x6,
             lag(xc, 7) OVER w AS x7
      FROM x
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, xc,
           (128 * xc + 64 * x1 + 32 * x2 + 16 * x3
            + 8 * x4 + 4 * x5 + 2 * x6 + 1 * x7) // 255 AS ewma_cents
    FROM l WHERE rn >= 8
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (α = ½, 8-tap) of each
    user's event values — the trend-smoothing primitive behind rate
    monitors and load gauges — computed ENTIRELY in integers: the
    geometric weights 128,64,…,1 (sum 255) over exact cents, floored
    once at the end, so both engines emit identical longs instead of
    accumulating floats in engine-specific order. The 8-tap truncation
    is the standard practical EWMA (weights beyond 8 taps contribute
    < 0.4%); rows without full history (rn < 8) are omitted rather
    than emitted with a renormalized partial kernel.

    A lag CHAIN, not a frame aggregate, on one (ts, event_id)-ordered
    window: Spark evaluates all eight lags in a single Window operator
    over one sort — ONE shuffle (hash(user_id)), one sort, zero
    re-scans; per-user partitions keep it embarrassingly parallel at
    100 TB. Same batch analog of the reference's per-entity gauges as
    q_ts_anomaly."""
    e = load(spark, sf_dir, "events").repartition("user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    xc = F.round(F.col("value") * 100).cast("long")
    l = e.select(
        "user_id",
        "event_id",
        xc.alias("xc"),
        F.row_number().over(w).alias("_rn"),
        *[F.lag(xc, k).over(w).alias(f"x{k}") for k in range(1, 8)],
    )
    num = (
        128 * F.col("xc") + 64 * F.col("x1") + 32 * F.col("x2")
        + 16 * F.col("x3") + 8 * F.col("x4") + 4 * F.col("x5")
        + 2 * F.col("x6") + F.col("x7")
    )
    return (
        l.filter(F.col("_rn") >= 8)
        .select(
            "user_id",
            "event_id",
            "xc",
            num.alias("_num"),
        )
        .withColumn("ewma_cents", F.expr("_num div 255"))
        .drop("_num")
    )


@register(
    "q_ts_seasonality",
    oracle="""
    WITH g AS (
      SELECT event_type,
             isodow(CAST(ts AS TIMESTAMP)) AS dow,
             hour(CAST(ts AS TIMESTAMP)) AS hod,
             count(*) AS n,
             SUM(CAST(value AS DECIMAL(27,4))) AS sv
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, CAST(dow AS BIGINT) AS dow, hod, n,
           CAST(sv AS DOUBLE) AS sum_value,
           (n * 1000) // CAST(sum(n) OVER (PARTITION BY event_type)
                              AS BIGINT) AS share_permille
    FROM g
    """,
)
def q_ts_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality profile: the (ISO weekday × hour-of-day)
    load heatmap per event type, each cell carrying its event count,
    exact value sum, and integer-permille share of the type's total —
    the capacity-planning / anomaly-baseline view every ops stack
    derives from its event stream. The share divides exact integers
    (floored permille), so no float ratio can flap; the value sum uses
    the standard decimal money convention. ISO weekday (Mon=1) is the
    cross-engine-stable day numbering: Spark's ``weekday()+1`` equals
    DuckDB's ``isodow`` for every timestamp, unlike the Sunday-origin
    ``dayofweek`` whose origin differs.

    Plan: ONE map-side-combined aggregate over the scan (the group key
    is derived, bounded at |types|·168 cells) plus a window over that
    TINY aggregate for the per-type total — the 100 TB cost is the
    scan, the shuffle moves ≤ 168 rows per type."""
    e = load(spark, sf_dir, "events")
    g = e.groupBy(
        "event_type",
        (F.weekday("ts") + 1).cast("long").alias("dow"),
        F.hour("ts").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value").alias("sv"),
    )
    return g.select(
        "event_type",
        "dow",
        "hod",
        "n",
        F.col("sv").cast("double").alias("sum_value"),
        F.expr("(n * 1000) div sum(n) OVER (PARTITION BY event_type)")
        .alias("share_permille"),
    )


@register(
    "q_events_dau_mau",
    oracle="""
    WITH du AS MATERIALIZED (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ),
    days AS MATERIALIZED (SELECT DISTINCT day FROM du),
    ex AS (
      SELECT du.user_id, du.day + CAST(o.off AS INTEGER) AS sday, o.off
      FROM du CROSS JOIN (SELECT unnest(range(28)) AS off) o
    ),
    lvl1 AS (
      SELECT sday, user_id, min(off) AS mo FROM ex GROUP BY 1, 2
    ),
    agg AS (
      SELECT sday, count(*) AS mau,
             count(*) FILTER (WHERE mo = 0) AS dau
      FROM lvl1 GROUP BY 1
    )
    SELECT CAST(d.day AS VARCHAR) AS day, dau, mau,
           (dau * 1000) // mau AS stickiness_permille
    FROM agg JOIN days d ON agg.sday = d.day
    """,
)
def q_events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU engagement: for every calendar day with activity, the
    count of users active that day (DAU), active in the trailing 28
    days (MAU), and the floored-permille stickiness ratio — the
    product-health metric every event pipeline reports. A user-day
    contributes to 28 as-of days, so the plan EXPLODES user-days by a
    28-row offset dimension and aggregates twice: level 1 collapses
    (as-of day, user) to min(offset) — a user's DAU membership is just
    min(offset)=0 — and level 2 counts rows. TWO hash aggregates,
    ZERO count-distincts: a single-agg formulation with two
    countDistinct columns would plan an Expand that doubles every
    exploded row (the q_dq_profile lesson). Days ship as ISO strings
    (the q_islands DATE-canonicalization rule); the ×28 row expansion
    is the algorithm's cost everywhere (Spark, DuckDB, BigQuery) and
    shrinks to |user-days|·28 — distinct user-days, not raw events —
    before it ever shuffles; the trailing 27-day tail past the corpus
    end is pruned by the broadcast-joined active-day dimension."""
    e = load(spark, sf_dir, "events")
    du = (
        e.repartition("user_id")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    days = du.select("day").distinct()
    ex = du.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.lit(0), F.lit(27))).alias("off"),
    ).select(
        "user_id",
        F.expr("date_add(day, off)").alias("sday"),
        "off",
    )
    lvl1 = ex.groupBy("sday", "user_id").agg(F.min("off").alias("mo"))
    agg = lvl1.groupBy("sday").agg(
        F.count(F.lit(1)).alias("mau"),
        F.sum(F.when(F.col("mo") == 0, 1).otherwise(0)).alias("dau"),
    )
    return agg.join(
        F.broadcast(days), agg["sday"] == days["day"]
    ).select(
        F.col("day").cast("string").alias("day"),
        "dau",
        "mau",
        F.expr("(dau * 1000) div mau").alias("stickiness_permille"),
    )


@register(
    "q_ts_changepoint",
    oracle="""
    WITH x AS MATERIALIZED (
      SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events
    ),
    tot AS MATERIALIZED (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xc) AS BIGINT) AS s
      FROM x GROUP BY 1
    ),
    c AS (
      SELECT x.event_type, x.event_id, x.ts,
             CAST(sum(CAST(x.xc AS DECIMAL(38,0)) * t.n - t.s)
                  OVER (PARTITION BY x.event_type
                        ORDER BY x.ts, x.event_id) AS DECIMAL(38,0))
               AS cusum
      FROM x JOIN tot t USING (event_type)
    ),
    r AS (
      SELECT event_type, event_id, ts, cusum,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY abs(cusum) DESC, ts, event_id) AS rk
      FROM c
    )
    SELECT event_type, event_id, ts,
           CAST(cusum AS VARCHAR) AS cusum_cleared
    FROM r WHERE rk = 1
    """,
)
def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection: per event type, the event where
    the cumulative deviation from the series mean peaks — the standard
    estimator of a single mean shift (where the running Σ(xᵢ − μ)
    attains max |·|). Denominators are CLEARED so every quantity is an
    exact integer: the running sum accumulates xᵢ·N − S (each term =
    N·(xᵢ − μ) exactly), so there is no float mean, no float running
    sum, and both engines agree to the digit — the reported statistic
    ships as a decimal string (it exceeds int64 beyond ~sf10 but
    decimal(38,0) holds it to ~1e38). Ties in |cusum| break on
    (ts, event_id).

    Plan: one tiny per-type aggregate (N, S) broadcast back onto the
    scan, ONE hash(event_type) shuffle carrying a running-frame window
    Spark evaluates incrementally, and a WindowGroupLimit-style rk=1
    filter. At 100 TB: per-type partitions are independent; the
    running sum never re-scans its frame. Mirrors the reference's
    per-type monitoring loop as a batch diagnostic."""
    e = load(spark, sf_dir, "events")
    xc = F.round(F.col("value") * 100).cast("long")
    x = e.select(
        "event_type", "event_id", "ts", xc.alias("xc")
    ).repartition("event_type")
    tot = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("xc").alias("s")
    )
    dec = "decimal(38,0)"
    j = x.join(F.broadcast(tot), "event_type")
    run = Window.partitionBy("event_type").orderBy("ts", "event_id")
    c = j.select(
        "event_type",
        "event_id",
        "ts",
        F.sum(
            F.col("xc").cast(dec) * F.col("n") - F.col("s")
        )
        .over(run)
        .cast(dec)
        .alias("cusum"),
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), "ts", "event_id"
    )
    return (
        c.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            "event_id",
            "ts",
            F.col("cusum").cast("string").alias("cusum_cleared"),
        )
    )


@register(
    "q_events_inter_arrival",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY event_type, user_id
                       ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS gap_us
      FROM events
    )
    SELECT event_type,
           count(gap_us) AS n_gaps,
           min(gap_us) AS min_us,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)
                AS BIGINT) AS p50_us,
           CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_us)
                AS BIGINT) AS p90_us,
           max(gap_us) AS max_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def q_events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution: per event type, the min / p50 /
    p90 / max of the microsecond gaps between a user's consecutive
    events of that type — the latency/cadence profile that sizes
    session timeouts, watermark delays (streaming/windows.py), and
    TTL retention (A13). Gaps are exact integer microseconds from a
    lag over the per-(type, user) timeline; percentiles are DISCRETE
    (an actual observed gap, percentile_disc semantics match exactly
    across engines on integers — interpolating percentile_cont floats
    would flap). Total order inside a timeline is (ts, event_id).

    ONE shuffle on hash(event_type, user_id) for the lag window, then
    a per-type aggregate the subset-key rule cannot serve (type ⊄
    (type, user)) — but that second exchange carries gaps only, no
    payload. At 100 TB the lag partitions are per-user-timeline
    (skew-free) and the percentile aggregate is the only global step."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    us = F.unix_micros("ts")
    g = e.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    g.createOrReplaceTempView("_ia_gaps")
    return spark.sql(
        """
        SELECT event_type,
               COUNT(gap_us) AS n_gaps,
               MIN(gap_us) AS min_us,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)
                 AS BIGINT) AS p50_us,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_us)
                 AS BIGINT) AS p90_us,
               MAX(gap_us) AS max_us
        FROM _ia_gaps GROUP BY event_type
        """
    )


#: journey prefix length and report size for q_events_path_prefix
_PATH_LEN = 3
_PATH_TOP = 20


@register(
    "q_events_path_prefix",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= {_PATH_LEN}
      GROUP BY user_id
    )
    SELECT path, count(*) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path LIMIT {_PATH_TOP}
    """,
)
def q_events_path_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the most common first-{_PATH_LEN}-event
    paths ("click>view>purchase") across all users — the free-form
    path-mining view between q_events_markov (single transitions) and
    q_funnel/q_seq_pattern (one fixed pattern): here the data names
    the patterns. Users with fewer events contribute their shorter
    prefix.

    Determinism: the path string is an ORDERED aggregation, so the
    engine collects (rn, type) structs and array_sorts before joining
    (the q_agg_listagg rule — an unordered listagg is arrival-order
    nondeterministic in every engine); rn comes from the (ts,
    event_id) total order. ONE hash(user_id) shuffle serves both the
    row_number window and the per-user path aggregate (subset-key
    rule); path counting shuffles |users| tiny strings, and the
    top-20 is a TakeOrderedAndProject with (count, path) total order.
    Per-user payload is bounded at {_PATH_LEN} structs by the rn
    filter ON the windowed stream — the collect never sees a user's
    full history."""
    e = load(spark, sf_dir, "events").repartition("user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = e.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= _PATH_LEN)
    paths = r.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(_PATH_TOP)
    )


@register(
    "q_win_rolling_median",
    oracle="""
    WITH x AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CAST(round(value * 100) AS BIGINT) AS xc
      FROM events
    ),
    f AS (
      SELECT user_id, event_id, xc,
             list(xc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 10 PRECEDING AND CURRENT ROW)
               AS frame
      FROM x
    )
    SELECT user_id, event_id, xc,
           CAST(len(frame) AS BIGINT) AS n_frame,
           list_sort(frame)[(len(frame) + 1) // 2] AS med_cents
    FROM f
    """,
)
def q_win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median: the lower median of each user's trailing
    11 event values — the robust-baseline smoother (median filters
    shrug off the outliers that wreck a rolling mean, which is why
    monitoring stacks pair q_ts_anomaly's z-score with a median
    baseline). Spark has no median window function, so the engine
    materializes the BOUNDED frame as an array (``collect_list`` over
    ROWS -10..0 — at most 11 longs), sorts it, and indexes the lower
    middle: exact integer cents in, exact integer out, no
    interpolation to flap across engines; DuckDB mirrors it with
    ``list() OVER`` + list_sort. The (len+1)//2 lower-median rule is
    the discrete percentile convention (q_agg_percentile_disc).

    ONE hash(user_id) shuffle, one sort, one bounded frame; per-row
    cost is sorting ≤11 elements. The frame bound is the contract: an
    UNBOUNDED collect-over-window is the memory anti-pattern this
    repo's collect_* rule forbids (q_agg_listagg docstring)."""
    e = load(spark, sf_dir, "events").repartition("user_id")
    xc = F.round(F.col("value") * 100).cast("long")
    fw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, 0)
    )
    f = e.select(
        "user_id",
        "event_id",
        xc.alias("xc"),
        F.collect_list(xc).over(fw).alias("frame"),
    )
    return f.select(
        "user_id",
        "event_id",
        "xc",
        F.size("frame").cast("long").alias("n_frame"),
        F.element_at(
            F.array_sort("frame"),
            ((F.size("frame") + 1) / 2).cast("int"),
        ).alias("med_cents"),
    )


@register(
    "q_events_rfm",
    oracle="""
    WITH wm AS (SELECT max(CAST(ts AS TIMESTAMP)) AS w FROM events),
    u AS (
      SELECT user_id,
             date_diff('day', max(CAST(ts AS TIMESTAMP)),
                       (SELECT w FROM wm)) AS recency_days,
             count(*) AS frequency,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT user_id, recency_days, frequency, monetary_cents,
             ntile(5) OVER (ORDER BY recency_days ASC, user_id) AS r,
             ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f,
             ntile(5) OVER (ORDER BY monetary_cents DESC, user_id) AS m
      FROM u
    )
    SELECT user_id, recency_days, frequency, monetary_cents, r, f, m,
           CASE WHEN r <= 2 AND f <= 2 THEN 'core'
                WHEN r <= 2 THEN 'recent'
                WHEN f <= 2 THEN 'lapsing-heavy'
                ELSE 'tail' END AS segment
    FROM s
    """,
)
def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every user scored 1–5 on Recency (days since
    last event, vs the corpus watermark), Frequency (event count), and
    Monetary (exact total cents), then bucketed into the classic
    marketing segments — the standard customer-value view over an
    event stream. All three quintiles carry a user_id tie-break, so
    ntile's bucket boundaries are deterministic; recency anchors on
    the corpus max-timestamp watermark (the q_dq_freshness
    convention), never wall-clock, so reruns are bit-identical.

    Plan: ONE map-combined per-user aggregate, then ONE distributed
    global ranking for all three axes — NOT three single-partition
    ntile windows (round 3's plan; a straggler/OOM at 1e9 users), and
    not three separate rankings either (rounds 4-10's plan: three
    range shuffles + three user_id joins). The three measures are
    stacked into a 3N-row skinny table keyed (axis, value, user_id) —
    all longs, DESC axes negated (exact) — and ONE
    ``scale.ranked_by_range`` pass over that total order produces a
    global rank from which each axis's own rank is recovered exactly
    as ``global_rank − axis·N`` (every axis contributes exactly N
    rows, and axis leads the sort order, so the stacked ranks of axis
    a occupy (a·N, (a+1)·N]). ``scale.ntile_from_rank`` then rebuilds
    the quintile — exact integer arithmetic, bit-identical to the
    window ntile — and one hash aggregate pivots (user_id, axis, q)
    back to one row per user. Exchanges over the |users| aggregate:
    one placement shuffle of 3N skinny rows + one hash shuffle + one
    join — versus 3 range shuffles + 3 joins before; A/B r11: sf0.1
    2.29→1.23 s, sf1 3.03→1.84 s warm min, results identical. r12:
    the rank pass runs the sampler-free per-axis layout
    (``group_col="__axis"``, scale.py) and N comes back exact in the
    layout — the 1-row n_total crossJoin broadcast and the sampler
    pass over the stack are both gone (A/B tools/ab_rangehelpers.py)."""
    from streamclient_spark.scale import ntile_from_rank, ranked_by_range

    e = load(spark, sf_dir, "events")
    wm = e.agg(F.max("ts").alias("w"))
    u = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "monetary_cents"
        ),
    )
    u = (
        u.join(F.broadcast(wm))  # 1-row watermark scalar
        .select(
            "user_id",
            F.datediff("w", "last_ts").cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
        # feeds the rank pass (probe + placement) + the final join base
        .localCheckpoint(eager=False)
    )

    stacked = u.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("long").alias("__axis"),
                    F.col("recency_days").alias("__k"),
                ),
                F.struct(
                    F.lit(1).cast("long").alias("__axis"),
                    (-F.col("frequency")).cast("long").alias("__k"),
                ),
                F.struct(
                    F.lit(2).cast("long").alias("__axis"),
                    (-F.col("monetary_cents")).alias("__k"),
                ),
            )
        ).alias("s"),
    ).select("user_id", "s.__axis", "s.__k")
    lay: dict = {}
    rk = ranked_by_range(
        stacked,
        ["__axis", "__k", "user_id"],
        rank_col="__g",
        group_col="__axis",
        layout=lay,
    )
    # every axis contributes exactly N = |users| rows; the layout's
    # exact per-group count replaces the old 1-row n_total crossJoin
    n_users = F.lit(int(lay["groups"].get(0, (0, 0))[1]))
    per_axis = rk.select(
        "user_id",
        "__axis",
        ntile_from_rank(
            F.col("__g") - F.col("__axis") * n_users, n_users, 5
        ).alias("__q"),
    )
    quint = per_axis.groupBy("user_id").agg(
        F.max(F.when(F.col("__axis") == 0, F.col("__q"))).alias("r"),
        F.max(F.when(F.col("__axis") == 1, F.col("__q"))).alias("f"),
        F.max(F.when(F.col("__axis") == 2, F.col("__q"))).alias("m"),
    )
    s = u.join(quint, "user_id")
    seg = (
        F.when((F.col("r") <= 2) & (F.col("f") <= 2), "core")
        .when(F.col("r") <= 2, "recent")
        .when(F.col("f") <= 2, "lapsing-heavy")
        .otherwise("tail")
    )
    return s.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r",
        "f",
        "m",
        seg.alias("segment"),
    )


@register(
    "q_events_new_returning",
    oracle="""
    WITH ud AS (
      SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    f AS (
      SELECT user_id, day, n_events,
             min(day) OVER (PARTITION BY user_id) AS first_day
      FROM ud
    )
    SELECT day,
           count(*) AS n_active,
           count(*) FILTER (WHERE day = first_day) AS n_new,
           count(*) FILTER (WHERE day <> first_day) AS n_returning,
           CAST(sum(n_events) AS BIGINT) AS n_events
    FROM f GROUP BY day
    """,
)
def q_events_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily active users — the growth-accounting
    split every product dashboard leads with: of today's active users,
    how many are seen for the first time ever. A user is "new" on the
    day equal to their min-over-history day (computed as a window over
    the per-(user, day) aggregate, NOT the raw stream — the fact table
    collapses ~events/user/day-fold before any window sorts it). Days
    compare as ISO strings (lexicographic == chronological, and string
    days dodge the cross-engine DATE hashing trap). Plan: one
    (user_id, day) map-combined aggregate, a user_id-partitioned
    min window over that much smaller table, then a day aggregate —
    the user_id shuffle is the only fact-scaled exchange and the
    window rides it (subset-partitioning rule)."""
    e = load(spark, sf_dir, "events")
    ud = (
        e.select(
            "user_id", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    first = F.min("day").over(Window.partitionBy("user_id"))
    f = ud.withColumn("first_day", first)
    return f.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(
            F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
        ).cast("long").alias("n_new"),
        F.sum(
            F.when(F.col("day") != F.col("first_day"), 1).otherwise(0)
        ).cast("long").alias("n_returning"),
        F.sum("n_events").alias("n_events"),
    )


@register(
    "q_events_freq_hist",
    oracle="""
    WITH u AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    )
    SELECT CAST(length(bin(n)) - 1 AS INT) AS log2_bin,
           count(*) AS n_users,
           min(n) AS min_events,
           max(n) AS max_events,
           CAST(sum(n) AS BIGINT) AS sum_events
    FROM u GROUP BY 1
    """,
)
def q_events_freq_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user curve: the frequency-of-frequencies histogram of
    events per user in power-of-two bins — the one-glance view of
    engagement skew (and the input you read before choosing a salting
    factor; C-105's skew profile is its join-key sibling). The bin
    index floor(log₂ n) is computed as length(bin(n)) − 1 — the
    binary-string length is EXACT integer arithmetic on both engines,
    where floor(log2(n)) trusts libm at power-of-two boundaries and
    misbins 2^k on the unlucky ulp. Plan: one map-combined per-user
    aggregate, then a ~32-group aggregate over it; nothing else
    shuffles."""
    e = load(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    log2_bin = (F.length(F.bin("n")) - 1).cast("int")
    return u.groupBy(log2_bin.alias("log2_bin")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("n").alias("min_events"),
        F.max("n").alias("max_events"),
        F.sum("n").alias("sum_events"),
    )


# ---------------------------------------------------------------------------
# q_ts_acf — autocorrelation of the daily event-count series (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_ts_acf",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT CAST(date_diff('day',
               (SELECT min(CAST(ts AS TIMESTAMP)::DATE) FROM events),
               CAST(ts AS TIMESTAMP)::DATE) AS BIGINT) AS t,
             count(*) AS c
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS sx,
             CAST(sum(c * c) AS BIGINT) AS sxx
      FROM daily
    ),
    lagged AS (
      SELECT l.k, count(*) AS n_pairs,
             CAST(sum(a.c * b.c) AS BIGINT) AS s_ab,
             CAST(sum(a.c) AS BIGINT) AS s_a,
             CAST(sum(b.c) AS BIGINT) AS s_b
      FROM daily a
      CROSS JOIN (SELECT unnest(range(1, 8)) AS k) l
      JOIN daily b ON b.t = a.t + l.k
      GROUP BY l.k
    )
    SELECT CAST(k AS BIGINT) AS lag_days,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           round((s_ab
                  - (CAST(sx AS DOUBLE) / n) * (s_a + s_b)
                  + n_pairs * (CAST(sx AS DOUBLE) / n)
                           * (CAST(sx AS DOUBLE) / n))
                 / (sxx - n * (CAST(sx AS DOUBLE) / n)
                            * (CAST(sx AS DOUBLE) / n)), 6) AS acf
    FROM lagged CROSS JOIN stats
    """,
)
def q_ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily event-count series at lags
    1-7 — the seasonality detector behind every capacity forecast
    (a weekly cycle shows as a peak at lag 7). Sample-ACF convention:
    lag-k products are centered on the FULL-series mean and normalized
    by the full-series centered sum of squares, expanded algebraically
    so every aggregate is an EXACT integer (Σxᵗxᵗ⁺ᵏ, Σx, Σx², pair
    counts) and the mean enters once, in deterministic double
    arithmetic rounded to 6 — no per-row float accumulates. Days are
    calendar-indexed (t = days since the corpus min), so a gap day
    simply contributes no pair.

    Plan: ONE map-combined daily aggregate (|days| rows), the 7 lags
    EXPLODED inline (7·|days| rows — no join against a lag table), one
    self-join on the tiny daily series, two 1-row broadcast scalars.
    At 100 TB the only data-sized work is the first aggregate; the ACF
    algebra runs on |days| ≈ thousands of rows."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    mn = daily.agg(F.min("day").alias("d0"))
    d = daily.join(F.broadcast(mn)).select(
        F.datediff("day", "d0").cast("long").alias("t"), "c"
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sx"),
        F.sum(F.col("c") * F.col("c")).alias("sxx"),
    )
    a = d.select(
        "t",
        F.col("c").alias("ca"),
        F.explode(F.array(*[F.lit(k) for k in range(1, 8)])).alias("k"),
    )
    lagged = (
        a.join(
            d.select(F.col("t").alias("tb"), F.col("c").alias("cb")),
            F.col("tb") == F.col("t") + F.col("k"),
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("ca") * F.col("cb")).alias("s_ab"),
            F.sum("ca").alias("s_a"),
            F.sum("cb").alias("s_b"),
        )
    )
    mu = F.col("sx").cast("double") / F.col("n")
    return lagged.join(F.broadcast(stats)).select(
        F.col("k").cast("long").alias("lag_days"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.round(
            (F.col("s_ab") - mu * (F.col("s_a") + F.col("s_b"))
             + F.col("n_pairs") * mu * mu)
            / (F.col("sxx") - F.col("n") * mu * mu),
            6,
        ).alias("acf"),
    )


# ---------------------------------------------------------------------------
# q_ts_cross_corr — lagged cross-correlation between two event series
# ---------------------------------------------------------------------------


@register(
    "q_ts_cross_corr",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             CAST(date_diff('day',
               (SELECT min(CAST(ts AS TIMESTAMP)::DATE) FROM events),
               CAST(ts AS TIMESTAMP)::DATE) AS BIGINT) AS t,
             count(*) AS c
      FROM events
      WHERE event_type IN ('purchase', 'view')
      GROUP BY 1, 2
    ),
    p AS (SELECT t, c FROM daily WHERE event_type = 'purchase'),
    v AS (SELECT t, c FROM daily WHERE event_type = 'view'),
    sp AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(c) AS BIGINT) AS s,
                  CAST(sum(c * c) AS BIGINT) AS ss FROM p),
    sv AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(c) AS BIGINT) AS s,
                  CAST(sum(c * c) AS BIGINT) AS ss FROM v),
    lagged AS (
      SELECT l.k, count(*) AS n_pairs,
             CAST(sum(p.c * v.c) AS BIGINT) AS s_pv,
             CAST(sum(p.c) AS BIGINT) AS s_p,
             CAST(sum(v.c) AS BIGINT) AS s_v
      FROM p
      CROSS JOIN (SELECT unnest(range(-3, 4)) AS k) l
      JOIN v ON v.t = p.t + l.k
      GROUP BY l.k
    )
    SELECT CAST(k AS BIGINT) AS lag_days,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           round((s_pv - (CAST(sv.s AS DOUBLE) / sv.n) * s_p
                       - (CAST(sp.s AS DOUBLE) / sp.n) * s_v
                       + n_pairs * (CAST(sp.s AS DOUBLE) / sp.n)
                                 * (CAST(sv.s AS DOUBLE) / sv.n))
                 / sqrt((sp.ss - sp.n * (CAST(sp.s AS DOUBLE) / sp.n)
                                      * (CAST(sp.s AS DOUBLE) / sp.n))
                      * (sv.ss - sv.n * (CAST(sv.s AS DOUBLE) / sv.n)
                                      * (CAST(sv.s AS DOUBLE) / sv.n))),
                 6) AS xcorr
    FROM lagged CROSS JOIN sp CROSS JOIN sv
    """,
)
def q_ts_cross_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the purchase and view daily
    series at lags −3..+3 — the lead/lag detector (do views predict
    purchases days later?). Same exact-integer expansion as q_ts_acf:
    every aggregate is an exact long, means and the final normalization
    enter once in double (``sqrt`` is IEEE-correctly-rounded on both
    engines, unlike libm logs), rounded to 6. Plan: one map-combined
    (type, day) aggregate, inline-exploded lags, one tiny self-join,
    three 1-row broadcasts — nothing data-sized past the first
    aggregate."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    mn = load(spark, sf_dir, "events").agg(
        F.min(F.to_date("ts")).alias("d0")
    )
    d = daily.join(F.broadcast(mn)).select(
        "event_type",
        F.datediff("day", "d0").cast("long").alias("t"),
        "c",
    )
    p = d.filter(F.col("event_type") == "purchase").select("t", "c")
    v = d.filter(F.col("event_type") == "view").select(
        F.col("t").alias("tv"), F.col("c").alias("cv")
    )

    sp = p.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("c").alias("spv"),
        F.sum(F.col("c") * F.col("c")).alias("spp"),
    )
    sv = v.agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum("cv").alias("svv_s"),
        F.sum(F.col("cv") * F.col("cv")).alias("svv_ss"),
    )
    a = p.select(
        "t",
        F.col("c").alias("cp"),
        F.explode(F.array(*[F.lit(k) for k in range(-3, 4)])).alias("k"),
    )
    lagged = (
        a.join(v, F.col("tv") == F.col("t") + F.col("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("cp") * F.col("cv")).alias("s_pv"),
            F.sum("cp").alias("s_p"),
            F.sum("cv").alias("s_v"),
        )
    )
    mup = F.col("spv").cast("double") / F.col("np")
    muv = F.col("svv_s").cast("double") / F.col("nv")
    return (
        lagged.join(F.broadcast(sp))
        .join(F.broadcast(sv))
        .select(
            F.col("k").cast("long").alias("lag_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.round(
                (F.col("s_pv") - muv * F.col("s_p") - mup * F.col("s_v")
                 + F.col("n_pairs") * mup * muv)
                / F.sqrt(
                    (F.col("spp") - F.col("np") * mup * mup)
                    * (F.col("svv_ss") - F.col("nv") * muv * muv)
                ),
                6,
            ).alias("xcorr"),
        )
    )


# ---------------------------------------------------------------------------
# q_ts_theil_sen — robust trend slope of the daily series (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_ts_theil_sen",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT CAST(date_diff('day',
               (SELECT min(CAST(ts AS TIMESTAMP)::DATE) FROM events),
               CAST(ts AS TIMESTAMP)::DATE) AS BIGINT) AS t,
             count(*) AS c
      FROM events GROUP BY 1
    ),
    slopes AS (
      SELECT CAST(b.c - a.c AS DOUBLE) / (b.t - a.t) AS slope,
             a.t AS ti, b.t AS tj
      FROM daily a JOIN daily b ON b.t > a.t
    ),
    ranked AS (
      SELECT slope,
             row_number() OVER (ORDER BY slope, ti, tj) AS rn,
             count(*) OVER () AS n
      FROM slopes
    )
    SELECT round(slope, 6) AS theil_sen_slope,
           CAST(n AS BIGINT) AS n_pairs
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def q_ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator over the daily event-count
    series: the MEDIAN of all pairwise slopes — outlier-immune where
    OLS (q_agg_regr) is not; the robust drift detector for noisy ops
    series. Slopes are double divisions of exact integers (identical
    bits on both engines), and the median is selected by integer rank
    over the total order (slope, ti, tj) — the discrete lower-median
    convention of q_agg_percentile_disc, so no interpolation and no
    tie ambiguity. Pairs are |days|² over the DAILY AGGREGATE (~2k
    pairs for a two-month corpus): quadratic in days, constant in data
    — the corpus scan is the only data-sized step at 100 TB, and the
    day count grows with the calendar, not the corpus."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mn = daily.agg(F.min("day").alias("d0"))
    d = daily.join(F.broadcast(mn)).select(
        F.datediff("day", "d0").cast("long").alias("t"), "c"
    )
    a = d.select(F.col("t").alias("ti"), F.col("c").alias("ca"))
    b = d.select(F.col("t").alias("tj"), F.col("c").alias("cb"))
    slopes = a.join(b, F.col("tj") > F.col("ti")).select(
        (
            (F.col("cb") - F.col("ca")).cast("double")
            / (F.col("tj") - F.col("ti"))
        ).alias("slope"),
        "ti",
        "tj",
    )
    w = Window.orderBy("slope", "ti", "tj")
    ranked = slopes.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select(
        F.round("slope", 6).alias("theil_sen_slope"),
        F.col("n").cast("long").alias("n_pairs"),
    )


# ---------------------------------------------------------------------------
# q_ts_holt — Holt double-exponential smoothing + forecast (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_ts_holt",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(ts AS TIMESTAMP)::DATE)
               AS rn,
             count(*) AS c
      FROM events
      GROUP BY event_type, CAST(ts AS TIMESTAMP)::DATE
    ),
    rec AS (
      WITH RECURSIVE h(event_type, rn, l, b) AS (
        SELECT event_type, rn, CAST(100 * c AS BIGINT),
               CAST(0 AS BIGINT)
        FROM daily WHERE rn = 1
        UNION ALL
        SELECT d.event_type, d.rn,
               (100 * d.c + h.l + h.b) // 2,
               (((100 * d.c + h.l + h.b) // 2) - h.l + h.b) // 2
        FROM h JOIN daily d
          ON d.event_type = h.event_type AND d.rn = h.rn + 1
      )
      SELECT * FROM h
    )
    SELECT event_type,
           CAST(rn AS BIGINT) AS n_days,
           CAST(l AS BIGINT) AS level_cents,
           CAST(b AS BIGINT) AS trend_cents,
           CAST(l + 7 * b AS BIGINT) AS forecast7_cents
    FROM rec
    QUALIFY rn = max(rn) OVER (PARTITION BY event_type)
    """,
)
def q_ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double-exponential) smoothing of each event
    type's daily count series, α = β = ½, plus the 7-step-ahead
    forecast — the trend-aware upgrade of q_ts_ewma (EWMA lags any
    sustained ramp; Holt's trend term tracks it), i.e. the standard
    capacity-forecast primitive. The coupled recursions

        l_t = (x_t·100 + l_{t-1} + b_{t-1}) div 2
        b_t = ((l_t − l_{t-1}) + b_{t-1}) div 2

    run in EXACT integer cents with truncating division — both
    engines truncate toward zero, so every intermediate state is
    bit-identical (no dyadic-float precision cliff at long horizons,
    no libm). A recurrence has no closed window form, so the engine
    folds each type's (ordered) daily array with ``aggregate`` — the
    array is CALENDAR-sized (days), never data-sized, which is the
    scale contract: at 100 TB the daily aggregate is the only
    data-sized step (map-combined, embarrassingly parallel) and the
    fold touches |types|·|days| cells. The oracle replays the same
    recursion as a recursive CTE (sequential by construction)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", "c"))
        ).alias("sd")
    )
    fold = F.expr(
        """
        aggregate(
          transform(slice(sd, 2, size(sd) - 1), s -> s.c),
          named_struct('l', CAST(100 * sd[0].c AS BIGINT),
                       'b', CAST(0 AS BIGINT)),
          (acc, x) -> named_struct(
            'l', (100 * x + acc.l + acc.b) div 2,
            'b', (((100 * x + acc.l + acc.b) div 2) - acc.l + acc.b)
                 div 2)
        )
        """
    )
    return series.select(
        "event_type",
        F.size("sd").cast("long").alias("n_days"),
        fold.alias("_hb"),
    ).select(
        "event_type",
        "n_days",
        F.col("_hb.l").cast("long").alias("level_cents"),
        F.col("_hb.b").cast("long").alias("trend_cents"),
        (F.col("_hb.l") + 7 * F.col("_hb.b"))
        .cast("long")
        .alias("forecast7_cents"),
    )


# ---------------------------------------------------------------------------
# q_ts_stl — additive trend/seasonal/remainder decomposition
# ---------------------------------------------------------------------------


@register(
    "q_ts_stl",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT CAST(date_diff('day',
               (SELECT min(CAST(ts AS TIMESTAMP)::DATE) FROM events),
               CAST(ts AS TIMESTAMP)::DATE) AS BIGINT) AS t,
             count(*) AS c
      FROM events GROUP BY 1
    ),
    ma AS (
      SELECT t, c, t % 7 AS dow,
             SUM(c) OVER w AS s7, COUNT(*) OVER w AS n7
      FROM daily
      WINDOW w AS (ORDER BY t RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    kept AS (SELECT t, dow, c, s7 FROM ma WHERE n7 = 7),
    seas AS (
      SELECT dow,
             CAST(SUM(7 * c - s7) AS BIGINT) AS s_num,
             count(*) AS n_dow
      FROM kept GROUP BY 1
    )
    SELECT k.t AS day_index,
           CAST(k.c AS BIGINT) AS n_events,
           round(CAST(k.s7 AS DOUBLE) / 7.0, 6) AS trend,
           round(CAST(seas.s_num AS DOUBLE) / (7.0 * seas.n_dow), 6)
             AS seasonal,
           round(CAST(k.c AS DOUBLE) - CAST(k.s7 AS DOUBLE) / 7.0
                 - CAST(seas.s_num AS DOUBLE) / (7.0 * seas.n_dow), 6)
             AS remainder
    FROM kept k JOIN seas USING (dow)
    """,
)
def q_ts_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the daily event-count series
    (the moving-average core of STL / classical `decompose`): trend =
    centered 7-day moving average, seasonal = per-day-of-week mean of
    the detrended series, remainder = the rest — the standard first
    step before anomaly detection or forecasting on any operational
    series (q_ts_anomaly and q_ts_holt consume exactly these parts).
    Every aggregate stays an EXACT integer until the epilogue: the
    detrended value is carried as the integer numerator 7·c − Σ7 (never
    the rounded double), the seasonal mean is that numerator summed over
    a day-of-week divided once by 7·n, and the remainder re-derives
    from the same integers in one textually identical double
    expression. Edge days without a full 7-day window are excluded
    (n7 = 7), matching the classical convention.

    Plan: ONE map-combined daily aggregate reduces the corpus to
    |days| rows; the centered window, day-of-week means, and the
    7-row seasonal join all run on that spine (the intended-tiny
    global window, |days| rows — same posture as q_ts_acf)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    mn = daily.agg(F.min("day").alias("d0"))
    d = daily.join(F.broadcast(mn)).select(
        F.datediff("day", "d0").cast("long").alias("t"), "c"
    )
    w = Window.orderBy("t").rangeBetween(-3, 3)
    ma = d.select(
        "t",
        "c",
        (F.col("t") % 7).alias("dow"),
        F.sum("c").over(w).alias("s7"),
        F.count(F.lit(1)).over(w).alias("n7"),
    )
    kept = ma.filter(F.col("n7") == 7).localCheckpoint(eager=False)
    seas = kept.groupBy("dow").agg(
        F.sum(F.lit(7) * F.col("c") - F.col("s7")).alias("s_num"),
        F.count(F.lit(1)).alias("n_dow"),
    )
    trend = F.col("s7").cast("double") / F.lit(7.0)
    seasonal = F.col("s_num").cast("double") / (
        F.lit(7.0) * F.col("n_dow")
    )
    return kept.join(F.broadcast(seas), "dow").select(
        F.col("t").alias("day_index"),
        F.col("c").cast("long").alias("n_events"),
        F.round(trend, 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(
            F.col("c").cast("double") - trend - seasonal, 6
        ).alias("remainder"),
    )


# ---------------------------------------------------------------------------
# q_ts_forecast_eval — Holt backtest: hold out the last week, measure error
# ---------------------------------------------------------------------------


@register(
    "q_ts_forecast_eval",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(ts AS TIMESTAMP)::DATE)
               AS rn,
             count(*) AS c
      FROM events
      GROUP BY event_type, CAST(ts AS TIMESTAMP)::DATE
    ),
    ntr AS (
      SELECT event_type, count(*) - 7 AS n_train
      FROM daily GROUP BY 1 HAVING count(*) >= 8
    ),
    rec AS (
      WITH RECURSIVE h(event_type, rn, l, b) AS (
        SELECT d.event_type, d.rn, CAST(100 * d.c AS BIGINT),
               CAST(0 AS BIGINT)
        FROM daily d JOIN ntr USING (event_type) WHERE d.rn = 1
        UNION ALL
        SELECT d.event_type, d.rn,
               (100 * d.c + h.l + h.b) // 2,
               (((100 * d.c + h.l + h.b) // 2) - h.l + h.b) // 2
        FROM h
        JOIN ntr ON ntr.event_type = h.event_type
        JOIN daily d
          ON d.event_type = h.event_type AND d.rn = h.rn + 1
         AND d.rn <= ntr.n_train
      )
      SELECT * FROM h
    ),
    fit AS (
      SELECT event_type, rn AS n_train, l, b FROM rec
      QUALIFY rn = max(rn) OVER (PARTITION BY event_type)
    ),
    errs AS (
      SELECT fit.event_type, fit.n_train,
             abs(fit.l + k.k * fit.b - 100 * d.c) AS ae,
             100 * d.c AS act
      FROM fit
      CROSS JOIN (SELECT unnest(range(1, 8)) AS k) k
      JOIN daily d ON d.event_type = fit.event_type
                  AND d.rn = fit.n_train + k.k
    )
    SELECT event_type,
           CAST(n_train AS BIGINT) AS n_train,
           CAST(SUM(ae) // 7 AS BIGINT) AS mae_cents,
           CAST(SUM(ae) * 1000 // SUM(act) AS BIGINT)
             AS wape_permille
    FROM errs GROUP BY 1, 2
    """,
)
def q_ts_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST: refit q_ts_holt's integer Holt recursion on
    every day except the last seven, forecast the held-out week, and
    report mean absolute error (integer cents-of-count) and weighted
    APE (integer permille) per event type — the eval-family member
    for forecasting (q_embed_recall is retrieval's, q_pipeline_funnel
    audits filtering): no forecast ships without its holdout error.
    WAPE divides the summed error by the summed actuals (one integer
    division), avoiding per-term MAPE division entirely; every
    intermediate is exact integer state shared bit-for-bit with the
    oracle's recursive CTE.

    Plan: identical to q_ts_holt — ONE map-combined daily aggregate,
    then per type a calendar-sized array fold (train slice) plus a
    7-element error transform, all inside one projection; |types|
    rows thereafter. The holdout join in the oracle is an array
    index here."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", "c"))
        ).alias("sd")
    ).filter(F.size("sd") >= 8)
    fold = F.expr(
        """
        aggregate(
          transform(slice(sd, 2, size(sd) - 8), s -> s.c),
          named_struct('l', CAST(100 * sd[0].c AS BIGINT),
                       'b', CAST(0 AS BIGINT)),
          (acc, x) -> named_struct(
            'l', (100 * x + acc.l + acc.b) div 2,
            'b', (((100 * x + acc.l + acc.b) div 2) - acc.l + acc.b)
                 div 2)
        )
        """
    )
    errs = F.expr(
        """
        transform(sequence(1, 7), k -> named_struct(
          'ae', abs(_hb.l + k * _hb.b
                    - 100 * sd[size(sd) - 8 + k].c),
          'act', CAST(100 * sd[size(sd) - 8 + k].c AS BIGINT)))
        """
    )
    return (
        series.select(
            "event_type",
            (F.size("sd") - 7).cast("long").alias("n_train"),
            fold.alias("_hb"),
            "sd",
        )
        .select("event_type", "n_train", errs.alias("_e"))
        .select(
            "event_type",
            "n_train",
            F.expr(
                "CAST(aggregate(_e, CAST(0 AS BIGINT),"
                " (s, x) -> s + x.ae) div 7 AS BIGINT)"
            ).alias("mae_cents"),
            F.expr(
                "CAST(aggregate(_e, CAST(0 AS BIGINT),"
                " (s, x) -> s + x.ae) * 1000"
                " div aggregate(_e, CAST(0 AS BIGINT),"
                " (s, x) -> s + x.act) AS BIGINT)"
            ).alias("wape_permille"),
        )
    )


# ---------------------------------------------------------------------------
# q_ts_holt_winters — additive Holt-Winters (level+trend+season) (round 5)
# ---------------------------------------------------------------------------


@register(
    "q_ts_holt_winters",
    oracle="""
    WITH daily AS MATERIALIZED (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(ts AS TIMESTAMP)::DATE)
               AS rn,
             count(*) AS c
      FROM events
      GROUP BY event_type, CAST(ts AS TIMESTAMP)::DATE
    ),
    arr AS MATERIALIZED (
      SELECT event_type, list(c ORDER BY rn) AS cs,
             CAST(count(*) AS BIGINT) AS n
      FROM daily GROUP BY 1 HAVING count(*) >= 8
    ),
    base AS MATERIALIZED (
      SELECT event_type, cs, n,
             CAST((100 * (cs[1]+cs[2]+cs[3]+cs[4]+cs[5]+cs[6]+cs[7]))
                  // 7 AS BIGINT) AS l0
      FROM arr
    ),
    rec AS (
      WITH RECURSIVE h(event_type, i, l, b, s) AS (
        SELECT event_type, CAST(7 AS BIGINT), l0, CAST(0 AS BIGINT),
               list_transform(cs[1:7], x -> CAST(100 * x - l0 AS BIGINT))
        FROM base
        UNION ALL
        SELECT h.event_type, h.i + 1,
               (100 * base.cs[h.i + 1] - h.s[1] + h.l + h.b) // 2,
               (((100 * base.cs[h.i + 1] - h.s[1] + h.l + h.b) // 2)
                - h.l + h.b) // 2,
               h.s[2:7] ||
               [CAST((100 * base.cs[h.i + 1]
                      - ((100 * base.cs[h.i + 1] - h.s[1] + h.l + h.b)
                         // 2)
                      + h.s[1]) // 2 AS BIGINT)]
        FROM h JOIN base USING (event_type) WHERE h.i < base.n
      )
      SELECT * FROM h
    )
    SELECT event_type,
           CAST(i AS BIGINT) AS n_days,
           CAST(l AS BIGINT) AS level_cents,
           CAST(b AS BIGINT) AS trend_cents,
           CAST(list_sum(s) AS BIGINT) AS season_sum_cents,
           CAST(7 * l + 28 * b + list_sum(s) AS BIGINT)
             AS forecast7_sum_cents
    FROM rec
    QUALIFY i = max(i) OVER (PARTITION BY event_type)
    """,
)
def q_ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters: level + trend + weekly (m=7) seasonal
    state over each event type's daily count series, α = β = γ = ½,
    plus the summed 7-day-ahead forecast — the seasonality-aware
    upgrade of q_ts_holt (Holt tracks ramps but rediscovers the
    weekend dip every week; the seasonal state remembers it), i.e.
    the standard short-horizon capacity model. The coupled recursions

        l_t = (x_t·100 − s_{t−7} + l_{t−1} + b_{t−1}) div 2
        b_t = ((l_t − l_{t−1}) + b_{t−1}) div 2
        s_t = ((x_t·100 − l_t) + s_{t−7}) div 2

    run in EXACT integer cents with truncating division (both engines
    truncate toward zero — bit-identical state at any horizon, the
    q_ts_holt doctrine extended to a VECTOR state: the length-7
    seasonal ring rotates through the fold). Init: l = integer mean
    of week 1, b = 0, s = week-1 deviations; types shorter than 8
    days are excluded by contract on both engines.

    Scale: the daily aggregate is the only data-sized step
    (map-combined); the fold walks a CALENDAR-sized array per type
    carrying a 7-cell ring — |types|·|days| cells total. The oracle
    replays the identical recursion as a recursive CTE over the same
    per-type array."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    series = (
        daily.groupBy("event_type")
        .agg(
            F.array_sort(F.collect_list(F.struct("day", "c"))).alias("sd")
        )
        .filter(F.size("sd") >= 8)
    )
    fold = F.expr(
        """
        aggregate(
          transform(slice(sd, 8, size(sd) - 7), s -> s.c),
          named_struct(
            'l', aggregate(slice(sd, 1, 7), CAST(0 AS BIGINT),
                           (a, s) -> a + 100 * s.c) div 7,
            'b', CAST(0 AS BIGINT),
            's', transform(slice(sd, 1, 7),
                   s -> 100 * s.c
                        - (aggregate(slice(sd, 1, 7), CAST(0 AS BIGINT),
                                     (a, t) -> a + 100 * t.c) div 7))),
          (acc, x) -> named_struct(
            'l', (100 * x - element_at(acc.s, 1) + acc.l + acc.b) div 2,
            'b', (((100 * x - element_at(acc.s, 1) + acc.l + acc.b)
                   div 2) - acc.l + acc.b) div 2,
            's', concat(slice(acc.s, 2, 6),
                   array((100 * x
                          - ((100 * x - element_at(acc.s, 1) + acc.l
                              + acc.b) div 2)
                          + element_at(acc.s, 1)) div 2)))
        )
        """
    )
    hw = series.select(
        "event_type",
        F.size("sd").cast("long").alias("n_days"),
        fold.alias("_st"),
    )
    season_sum = F.expr(
        "aggregate(_st.s, CAST(0 AS BIGINT), (a, x) -> a + x)"
    )
    return hw.select(
        "event_type",
        "n_days",
        F.col("_st.l").cast("long").alias("level_cents"),
        F.col("_st.b").cast("long").alias("trend_cents"),
        season_sum.cast("long").alias("season_sum_cents"),
        (7 * F.col("_st.l") + 28 * F.col("_st.b") + season_sum)
        .cast("long")
        .alias("forecast7_sum_cents"),
    )


# ---------------------------------------------------------------------------
# q_ts_mk_trend — Mann-Kendall monotonic-trend test (C-244)
# ---------------------------------------------------------------------------


@register(
    "q_ts_mk_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    ),
    nd AS (
      SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1
    ),
    mk AS (
      SELECT a.event_type, count(*) AS n_pairs,
             CAST(sum(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day
      GROUP BY 1
    )
    SELECT nd.event_type, nd.n_days, mk.n_pairs, mk.s_stat,
           mk.s_stat * 1000 // mk.n_pairs AS tau_permille,
           CASE WHEN mk.s_stat > 0 THEN 'up'
                WHEN mk.s_stat < 0 THEN 'down'
                ELSE 'flat' END AS trend
    FROM nd JOIN mk USING (event_type)
    """,
)
def q_ts_mk_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per event type: S = Σ_{i<j}
    sign(x_j − x_i) over the daily-revenue series, with Kendall's tau
    (S over the pair count) as floored integer permille — the
    distribution-free "is this series drifting?" answer that a slope
    fit (q_ts_theil_sen gives the magnitude) can't give robustly when
    the series is non-normal or stepped. Exact integer cents in, sign
    comparisons and integer division out — nothing can flap.

    Plan: the map-combined daily aggregate collapses the corpus to
    |types|×|days| rows (150 here; calendar-bounded always), then the
    i<j pair join runs per type on a broadcast-sized series and the
    verdict is a |types|-row aggregate. At 100 TB the corpus-sized
    work is exactly the one daily-rollup shuffle; the O(n²) pair stage
    never sees the corpus — it is bounded by the calendar window
    (n=365 → 66k pairs per type). For multi-year windows swap the
    pair join for the O(n log n) inversion-count decomposition; at
    this calendar scale the join IS the cheaper plan. Both engines
    truncate the tau division toward zero (Spark ``div``, DuckDB
    ``//``) so negative-S series agree bit-for-bit."""
    e = load(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
        .localCheckpoint(eager=False)  # pair join + n_days share it
    )
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (
        F.when(F.col("b.cents") > F.col("a.cents"), 1)
        .when(F.col("b.cents") < F.col("a.cents"), -1)
        .otherwise(0)
    )
    mk = (
        a.join(
            F.broadcast(b),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(sgn).cast("long").alias("s_stat"),
        )
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days")
    )
    return nd.join(mk, "event_type").select(
        "event_type",
        "n_days",
        "n_pairs",
        "s_stat",
        F.expr("s_stat * 1000 div n_pairs").alias("tau_permille"),
        F.when(F.col("s_stat") > 0, "up")
        .when(F.col("s_stat") < 0, "down")
        .otherwise("flat")
        .alias("trend"),
    )
