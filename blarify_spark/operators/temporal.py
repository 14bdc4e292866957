"""Temporal operators over the `events` table.

Custom operators Spark's join set lacks natively (task brief: as-of /
range joins as first-class custom ops; blarify's closest analog is the
timestamped INTEGRATION_SEQUENCE crawl ordering,
repositories/graph_db_manager/queries.py history traversals).

Scale notes:
* The as-of join is the union-and-window formulation: tag both sides,
  union, ONE hash shuffle on the equality key, one in-partition sort —
  O(n log n) per partition, no range-join row explosion, no driver
  collect. This is the distributed as-of strategy (cf. pandas
  merge_asof, which is single-node); a 100 TB run shuffles each side
  once, and AQE handles skewed users.
* The DuckDB oracle uses the engine's native ASOF JOIN — an independent
  algorithm (binary search per probe) that must agree row-for-row, which
  is stronger evidence than mirroring the window trick in SQL.
* Timestamps leave as tz-free wall-clock strings (identical
  date_format / strftime patterns, byte-verified) so the compare never
  depends on the consuming session's timezone — the parquet ts is
  TIMESTAMP_NTZ, and any epoch conversion would reintroduce one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from blarify_spark.operators.registry import register
from blarify_spark.sources.tables import load_tables

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"  # == DuckDB '%Y-%m-%d %H:%M:%S.%f'


def _ts_str(col):  # noqa: ANN001
    return F.date_format(col, _TS_FMT)


@register(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS last_click_ts_str,
           c.value AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    ORDER BY p.event_id
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each purchase event picks the latest click
    by the same user at or before its timestamp.

    Distributed formulation: union the tagged sides, shuffle once on
    user_id, and carry the click payload forward with
    last(..., ignorenulls) over (ts, side) — right rows sort before left
    rows at equal ts so the `<=` bound is inclusive. Purchases with no
    prior click keep NULLs (left join semantics).
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_left"),
        "event_id",
        F.lit(None).cast("timestamp_ntz").alias("r_ts"),
        F.lit(None).cast("double").alias("r_value"),
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_left"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    # deterministic even under (user_id, ts) collisions: right-before-left
    # at equal ts (inclusive bound), then event_id
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_left", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        left.unionByName(right)
        .select(
            "event_id",
            "user_id",
            "ts",
            "is_left",
            F.last("r_ts", ignorenulls=True).over(w).alias("last_click_ts"),
            F.last("r_value", ignorenulls=True).over(w).alias("last_click_value"),
        )
        .filter(F.col("is_left") == 1)
        .select(
            "event_id",
            "user_id",
            _ts_str("ts").alias("ts_str"),
            _ts_str("last_click_ts").alias("last_click_ts_str"),
            "last_click_value",
        )
        .orderBy("event_id")
    )


@register(
    "tumbling_window_event_stats",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 15 MINUTE, ts),
                    '%Y-%m-%d %H:%M:%S.%f') AS window_start_str,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
             AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start_str, event_type
    """,
)
def tumbling_window_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute tumbling event-time windows via Spark's native
    `F.window` — the exact groupBy a Structured Streaming job would run
    with a watermark (streaming/incremental.py carries the streaming KG
    twin; this pins the batch==stream window semantics on the events
    table). Map-side partial aggregation applies; the shuffle carries one
    row per (window, type) per partition.
    """
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        ev.groupBy(
            F.window("ts", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(cents).cast("double") / 100).alias("sum_value"),
        )
        .select(
            _ts_str(F.col("w.start")).alias("window_start_str"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start_str", "event_type")
    )


@register(
    "funnel_stage_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS vts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS cts
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.vts
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS pts
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.cts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM v
    UNION ALL
    SELECT '2_click' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM c
    UNION ALL
    SELECT '3_purchase' AS stage, CAST(COUNT(*) AS BIGINT) AS users FROM p
    ORDER BY stage
    """,
)
def funnel_stage_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): a user advances a stage
    only with an event STRICTLY AFTER their previous stage's first event.

    Each stage is one filtered aggregate joined to the previous stage's
    per-user anchor timestamp — three shuffles on user_id total, and every
    join key is the already-aggregated per-user row (small side,
    broadcast-able). The event-sequence semantics mirror the
    INTEGRATION_SEQUENCE ordering blarify attaches to crawl provenance
    (plans/provenance.py)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .alias("e")
        .join(v.alias("v"), "user_id")
        .filter(F.col("e.ts") > F.col("vts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .alias("e")
        .join(c.alias("c"), "user_id")
        .filter(F.col("e.ts") > F.col("cts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pts"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("users"),
        )

    return (
        stage(v, "1_view")
        .unionByName(stage(c, "2_click"))
        .unionByName(stage(p, "3_purchase"))
        .orderBy("stage")
    )


GAPFILL_USER_BOUND = 20


@register(
    "gapfill_hourly_user_values",
    oracle=f"""
    WITH f AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS v_cents,
             COUNT(*) AS n
      FROM events WHERE user_id < {GAPFILL_USER_BOUND}
      GROUP BY user_id, date_trunc('hour', ts)
    ), span AS (
      SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM f GROUP BY user_id
    ), hours AS (
      SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM span
    ), j AS (
      SELECT hours.user_id, hours.h, f.v_cents, f.n
      FROM hours LEFT JOIN f
        ON f.user_id = hours.user_id AND f.h = hours.h
    )
    SELECT user_id,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_str,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_events,
           CAST(last_value(v_cents IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100 AS carried_value
    FROM j ORDER BY user_id, hour_str
    """,
)
def gapfill_hourly_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with gap-fill: for each (bounded) user, emit every
    hour between their first and last event; hours with no events carry
    the last observed hourly value forward (time-series densification).

    The hour spectrum comes from `sequence()` exploded per user — rows
    scale with users x span, NOT with raw events, and the user bound (a
    scale fence mirrored in the oracle) keeps the demo deterministic. One
    shuffle on user_id for the hourly aggregate; the explode, left join
    and carry-forward window all reuse that partitioning. DuckDB rebuilds
    the spectrum independently with generate_series + IGNORE NULLS
    last_value."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = (
        ev.filter(F.col("user_id") < GAPFILL_USER_BOUND)
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum(cents).alias("v_cents"), F.count(F.lit(1)).alias("n"))
    )
    hours = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    j = hours.join(hourly, ["user_id", "h"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        j.select(
            "user_id",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour_str"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            (
                F.last("v_cents", ignorenulls=True).over(w).cast("double")
                / 100
            ).alias("carried_value"),
        )
        .orderBy("user_id", "hour_str")
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH firstd AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             date_diff('day', f.cohort_day, date_trunc('day', e.ts))
               AS offset_days
      FROM events e JOIN firstd f ON f.user_id = e.user_id
    )
    SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day_str,
           CAST(offset_days AS BIGINT) AS offset_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active
    GROUP BY cohort_day, offset_days
    ORDER BY cohort_day_str, offset_days
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each later day-offset they were active (the standard
    product-analytics retention triangle).

    Two shuffles on user_id (first-day aggregate, then the distinct over
    (user, offset)); the final (cohort, offset) aggregate is tiny. The
    cohort join side is one row per user — broadcast-able at any scale."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    firstd = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("cohort_day")
    )
    active = (
        ev.join(firstd, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", "ts"), F.col("cohort_day")).alias(
                "offset_days"
            ),
        )
        .distinct()
    )
    return (
        active.groupBy("cohort_day", "offset_days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day_str"),
            F.col("offset_days").cast("bigint").alias("offset_days"),
            "n_users",
        )
        .orderBy("cohort_day_str", "offset_days")
    )


ERROR_BURST_WINDOW_S = 86400  # trailing 24 h (5-min windows are vacuous on this corpus's error rate)


@register(
    "error_burst_windows",
    oracle=f"""
    WITH err AS (
      -- exact microsecond offsets from a fixed wall-clock anchor:
      -- tz-free and integral in BOTH engines (epoch()/unix conversions
      -- would be fractional or tz-dependent for NTZ timestamps)
      SELECT user_id, event_id,
             date_diff('microsecond',
                       TIMESTAMP '2024-01-01 00:00:00', ts) AS us
      FROM events WHERE event_type = 'error'
    ), counted AS (
      SELECT user_id, event_id,
             COUNT(*) OVER (
               PARTITION BY user_id ORDER BY us
               RANGE BETWEEN {ERROR_BURST_WINDOW_S * 1_000_000} PRECEDING
                         AND CURRENT ROW) AS errs_24h
      FROM err
    )
    SELECT user_id, event_id, CAST(errs_24h AS BIGINT) AS errs_24h
    FROM counted WHERE errs_24h >= 3
    ORDER BY user_id, event_id
    """,
)
def error_burst_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding range-frame burst detector: for every error event, count
    errors by the same user in the trailing 24 hours (RANGE frame over
    event-time microseconds, the batch analog of a sliding streaming
    window); emit events whose trailing count reaches 3.

    One shuffle on user_id; the RANGE frame runs in-partition over the
    sorted event times — no self-join, no interval explosion. The frame
    key is microseconds since a fixed NTZ anchor (timestampdiff /
    date_diff'microsecond') — exact integers, tz-free, identical in both
    engines."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND,"
            " TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        ).alias("us"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-ERROR_BURST_WINDOW_S * 1_000_000, 0)
    )
    return (
        err.select(
            "user_id",
            "event_id",
            F.count(F.lit(1)).over(w).cast("bigint").alias("errs_24h"),
        )
        .filter(F.col("errs_24h") >= 3)
        .orderBy("user_id", "event_id")
    )


@register(
    "event_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events
    ), trans AS (
      SELECT event_type AS prev_type, next_type,
             COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS prob
    FROM trans
    ORDER BY prev_type, next_type
    """,
)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (the session-modeling / next-action primitive): LEAD over
    (ts, event_id) pairs each event with its successor, then one
    aggregate yields counts and row-normalized probabilities.

    One shuffle on user_id for the sequence window; the transition
    aggregate is 25 rows (5x5 types) regardless of corpus size, so the
    normalizing window is driver-trivial. The (ts, event_id) ordering
    is total — ties cannot flip successors between engines — and prob
    is one IEEE division of exact counts."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("prev_type"), "next_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    wp = W.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / F.sum("n").over(wp)).alias("prob"),
    ).orderBy("prev_type", "next_type")
