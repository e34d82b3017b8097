"""Streaming-semantics queries: SURVEY.md §2.B Q27–Q30.

Q27 windows run in batch mode (same window operators Structured
Streaming uses — the spec requires batch-runnable oracle comparison).
Q28/Q29 run REAL streaming queries: the events table is replayed as
arrival-day micro-batches (streaming/replay.py), with watermark-driven
late-data drop and stateful dedup; the memory-sink result is compared
to a closed-form oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from hephaestus_spark.functions.money import sum_money, sum_money_sql
from hephaestus_spark.registry import query
from hephaestus_spark.sources import load_table
from hephaestus_spark.streaming.replay import replay_streaming


# --------------------------------------------------------------------------
# Q27 — tumbling / sliding / session windows
# --------------------------------------------------------------------------
@query(
    "q27_window_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           {sum_money_sql('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q27_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        # scaled-long exact sum: order-independent, bit-identical across
        # engines at integer speed (functions/money.py, r5 — replaces
        # the r4 decimal accumulator the bench flagged)
        .agg(
            F.count("*").alias("n"),
            sum_money(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q27_window_sliding",
    oracle=f"""
    SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
             - CAST(k AS INTEGER) * INTERVAL '15 minutes'       AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           {sum_money_sql('value')} AS sum_value
    FROM events, UNNEST([0, 1, 2, 3]) AS t(k)
    GROUP BY 1, 2
    """,
)
def q27_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding every 15min: each event lands in 4 windows.
    The oracle enumerates the same 4 via UNNEST — both align window
    starts to 15-minute grid points."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(
            F.count("*").alias("n"),
            sum_money(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "x_window_session",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    islands AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, session_no
    """,
)
def q27_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(ts, 30min) per user. Spark sessions are half-open
    [start, last+gap): an event exactly gap after the previous one
    starts a NEW session — the oracle's gaps-and-islands break is
    therefore `>=`, not `>` (SURVEY.md §7 risk 3)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q27_session_stateful",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
             lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL OR ts - prev_ts >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM ordered
    ),
    islands AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS sum_value
    FROM islands GROUP BY user_id, session_no
    """,
)
def q27_session_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q27_window_session re-implemented as a CUSTOM stateful operator
    (applyInPandasWithState, streaming/stateful.py): per-user session
    state with event-time-timeout emission, replayed as day-ordered
    micro-batches. A far-future sentinel row advances the final
    watermark so every open session times out and emits — proving the
    timeout path produces exactly the session_window/gaps-and-islands
    result. State is per-key in the executor state store: O(users)
    distributed, nothing on the driver."""
    from hephaestus_spark.streaming.stateful import session_stats_stream

    e = load_table(spark, sf_dir, "events")
    feed = e.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
        F.to_date("ts").alias("arrival_day"),
    )
    sentinel = spark.createDataFrame(
        [(-1, "2033-01-01 00:00:00", 0.0, "2033-01-01")],
        "user_id long, ts string, value double, arrival_day string",
    ).select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "value",
        F.col("arrival_day").cast("date").alias("arrival_day"),
    )
    feed = feed.unionByName(sentinel)

    def sessions(stream: DataFrame) -> DataFrame:
        return session_stats_stream(
            stream.withWatermark("ts", "1 day"), gap_ms=30 * 60 * 1000
        )

    out = replay_streaming(spark, feed, "arrival_day", sessions, output_mode="append")
    return out.filter(F.col("user_id") >= 0).select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
        "sum_value",
    )


# --------------------------------------------------------------------------
# Q28 — watermark / late data (REAL streaming, replayed by arrival day)
# --------------------------------------------------------------------------
# Late-arrival fixture (FIXTURES.md B8): rows with event_id % 50 == 0 and
# ts-day in [Jan 4, Jan 27] arrive 3 days late. With a 1-day watermark
# their day-window state is long closed when they arrive -> dropped.
# Append mode emits a day's aggregate only once the watermark passes its
# window end; the final watermark is max(ts) - 1 day, so trailing days
# never emit. The oracle encodes exactly that.
_LATE_COND_DUCK = (
    "event_id % 50 = 0 AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-04'"
    " AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-28'"
)


@query(
    "q28_watermark_late",
    oracle=f"""
    WITH wm AS (SELECT max(CAST(ts AS TIMESTAMP)) - INTERVAL '1 day' AS final_wm
                FROM events)
    SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
           CAST(count(*) AS BIGINT) AS n
    FROM events, wm
    WHERE NOT ({_LATE_COND_DUCK})
      AND date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL '1 day' <= wm.final_wm
    GROUP BY 1
    """,
)
def q28_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """withWatermark('ts','1 day') + tumbling day window in append mode,
    fed by arrival-day micro-batches. Late rows (3-day delay) hit closed
    state and are dropped; emitted day counts equal batch counts over
    on-time rows — the streaming/batch consistency contract (A20)."""
    e = load_table(spark, sf_dir, "events")
    late = (
        (F.col("event_id") % 50 == 0)
        & (F.col("ts") >= F.lit("2024-01-04").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-01-28").cast("timestamp_ntz"))
    )
    feed = e.select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(late, F.date_add(F.to_date("ts"), 3))
        .otherwise(F.to_date("ts"))
        .alias("arrival_day"),
    )

    def agg(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", "1 day")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("day"), "n")
        )

    out = replay_streaming(spark, feed, "arrival_day", agg, output_mode="append")
    return out.select(F.col("day").cast("timestamp_ntz").alias("day"), "n")


# --------------------------------------------------------------------------
# Q29 — streaming dedup (REAL streaming)
# --------------------------------------------------------------------------
@query(
    "q29_stream_dedup",
    oracle="SELECT event_id, event_type, value FROM events",
)
def q29_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates(['event_id']) with a watermark, over a feed where
    every event_id % 10 == 0 row is re-delivered one day later (at-least-
    once upstream, A1's hash-skip motivation). The 2-day watermark keeps
    dedup state alive across the redelivery gap, so the streamed output
    equals the exactly-once set."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
        F.to_date("ts").alias("arrival_day"),
    )
    dupes = base.filter(F.col("event_id") % 10 == 0).withColumn(
        "arrival_day", F.date_add(F.col("arrival_day"), 1)
    )
    feed = base.union(dupes)

    def dedup(stream: DataFrame) -> DataFrame:
        return (
            stream.withWatermark("ts", "2 days")
            .dropDuplicates(["event_id"])
            .select("event_id", "event_type", "value")
        )

    return replay_streaming(spark, feed, "arrival_day", dedup, output_mode="append")


# --------------------------------------------------------------------------
# Q30 — top-/last-per-group (A19 generalization)
# --------------------------------------------------------------------------
@query(
    "q30_max_by",
    oracle="""
    SELECT user_id,
           max_by(event_type,
                  CAST(round(value * 100) AS BIGINT) * 100000000 + event_id)
             AS top_event_type,
           max(value) AS max_value
    FROM events GROUP BY user_id
    """,
)
def q30_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by with an exact integer composite key (value cents, then
    event_id): values are 2-decimal doubles, so per-user maxima can tie —
    the composite makes the winner deterministic on both engines."""
    e = load_table(spark, sf_dir, "events")
    key = (F.round(F.col("value") * 100).cast("bigint") * 100000000 + F.col("event_id"))
    return e.groupBy("user_id").agg(
        F.expr(
            "max_by(event_type, CAST(round(value * 100) AS BIGINT) * 100000000 + event_id)"
        ).alias("top_event_type"),
        F.max("value").alias("max_value"),
    )


@query(
    "q30_last_event",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT user_id, event_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q30_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last event per user by event time (A19's ORDER BY updated_at DESC
    LIMIT 1, generalized per group)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


# --------------------------------------------------------------------------
# Stream-stream join (REAL streaming, beyond the declared inventory)
# --------------------------------------------------------------------------
@query(
    "x_stream_join",
    oracle="""
    SELECT l.event_id AS l_event_id, r.event_id AS r_event_id,
           l.user_id, l.ts AS l_ts, r.ts AS r_ts
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_id % 2 = 0 AND r.event_id % 2 = 1
     AND r.ts BETWEEN l.ts - INTERVAL 1 HOUR AND l.ts + INTERVAL 1 HOUR
    """,
)
def x_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner self-join: even-id events joined
    to odd-id events of the same user within ±1 hour, replayed as
    day-by-day micro-batches. Both sides carry a 2-day watermark so the
    join state for past hours is evicted as the watermark advances —
    bounded state regardless of stream length, which is what makes the
    operator viable on an unbounded 100 TB/day feed. With full delivery
    (AvailableNow) the emitted pairs equal the batch join, which is
    exactly what the oracle states."""
    e = load_table(spark, sf_dir, "events")
    feed = e.select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        F.to_date("ts").alias("arrival_day"),
    )

    def join(stream: DataFrame) -> DataFrame:
        left = (
            stream.filter(F.col("event_id") % 2 == 0)
            .select(
                F.col("event_id").alias("l_event_id"),
                "user_id",
                F.col("ts").alias("l_ts"),
            )
            .withWatermark("l_ts", "2 days")
        )
        right = (
            stream.filter(F.col("event_id") % 2 == 1)
            .select(
                F.col("event_id").alias("r_event_id"),
                F.col("user_id").alias("r_user_id"),
                F.col("ts").alias("r_ts"),
            )
            .withWatermark("r_ts", "2 days")
        )
        return left.join(
            right,
            (F.col("user_id") == F.col("r_user_id"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 HOUR")),
        ).select("l_event_id", "r_event_id", "user_id", "l_ts", "r_ts")

    return replay_streaming(spark, feed, "arrival_day", join, output_mode="append")


@query(
    "x_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS t_v FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS t_c
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t_v
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_p
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t_c
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT v.user_id,
           CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END
                AS BIGINT) AS stage
    FROM v
    LEFT JOIN c ON c.user_id = v.user_id
    LEFT JOIN p ON p.user_id = v.user_id
    """,
)
def x_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click -> purchase): per user,
    the first view, the first click strictly AFTER it, the first
    purchase strictly after THAT; stage = how deep the user got (1-3).

    Three min-aggregations chained by user_id equi-joins — every
    shuffle is keyed on user_id so AQE can reuse the partitioning, and
    each stage's input shrinks to the survivors of the previous one.
    The ordered-sequence semantics (not mere co-occurrence) is what
    product funnels actually mean and what naive event-type counting
    gets wrong."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_c"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_c"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    return (
        v.join(c.select("user_id", F.lit(1).alias("_c")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("_p")), "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.coalesce(F.col("_c"), F.lit(0))
                + F.coalesce(F.col("_p"), F.lit(0))
            )
            .cast("bigint")
            .alias("stage"),
        )
    )


@query(
    "x_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(datediff('day', f.cohort_week,
                           date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset
      FROM events e JOIN firsts f ON f.user_id = e.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week, week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity GROUP BY 1, 2
    """,
)
def x_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by first-event week,
    counted once per (cohort, week offset) they were active in.

    Two shuffles, both on user_id (the min-agg and the join — AQE can
    reuse the partitioning), then a distinct + count on the tiny
    (cohort, offset) key space. Cohort week emitted as a string: DATE
    wire formats differ across engines, strings don't."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.count("*").cast("bigint").alias("n_users"))


# --------------------------------------------------------------------------
# r5: multi-granularity rollup (continuous-aggregate chain)
# --------------------------------------------------------------------------
@query(
    "x_multi_granularity_rollup",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), daily AS (
      SELECT event_type, date_trunc('day', h) AS d,
             CAST(sum(n) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS cents
      FROM hourly GROUP BY 1, 2
    ), monthly AS (
      SELECT event_type, date_trunc('month', d) AS m,
             CAST(sum(n) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS cents
      FROM daily GROUP BY 1, 2
    )
    SELECT 'hour'  AS grain, event_type, h AS bucket, n, CAST(cents AS DOUBLE)/100.0 AS sum_value FROM hourly
    UNION ALL
    SELECT 'day',   event_type, d, n, CAST(cents AS DOUBLE)/100.0 FROM daily
    UNION ALL
    SELECT 'month', event_type, m, n, CAST(cents AS DOUBLE)/100.0 FROM monthly
    """,
)
def x_multi_granularity_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate chain: hour -> day ->
    month rollups where each coarser grain RE-AGGREGATES the finer
    one's partials — the fact table is scanned exactly once, and the
    day/month stages shuffle |hourly| / |daily| rows, not |events|.
    This works because (count, scaled-long sum) are decomposable
    aggregates — the same property that makes the hourly table a valid
    streaming materialization (each micro-batch merges into it, and
    coarser grains refresh from it, never from the raw stream).

    Exactness: integer cents at every level — re-aggregation of
    partials is bit-identical to direct aggregation, which the shared
    union output proves against the oracle's equivalent CTE chain."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type",
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("bucket"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
                "cents"
            ),
        )
    )
    daily = (
        hourly.groupBy(
            "event_type", F.date_trunc("day", "bucket").alias("bucket")
        )
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )
    monthly = (
        daily.groupBy(
            "event_type", F.date_trunc("month", "bucket").alias("bucket")
        )
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )

    def out(df: DataFrame, grain: str) -> DataFrame:
        return df.select(
            F.lit(grain).alias("grain"),
            "event_type",
            "bucket",
            F.col("n").cast("bigint").alias("n"),
            (F.col("cents").cast("double") / 100.0).alias("sum_value"),
        )

    return out(hourly, "hour").unionByName(out(daily, "day")).unionByName(
        out(monthly, "month")
    )
