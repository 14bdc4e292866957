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
