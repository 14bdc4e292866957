"""Sketch operators: HyperLogLog distinct counts and quantile sketches.

The third leg of the engine's sketch family (MinHash / SimHash /
winnowing fingerprints cover similarity; these cover cardinality and
distribution). Both are the operators a 100 TB profiling pass actually
runs: exact distinct counts and exact percentiles need a full shuffle of
the key universe, while the sketches are one map-side pass + a
constant-size merge — the shuffle carries kilobytes per partition
instead of the data.

Approximate results are engine-specific (Spark's HLL++ and KLL/GK
sketches won't bit-match DuckDB's), so both queries are rows-only; the
accuracy contract is pinned by tests/test_sketches.py against the exact
answers computed in the same session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from blarify_spark.operators.registry import register
from blarify_spark.sources.tables import load_tables

HLL_RSD = 0.02  # target relative standard deviation for approx distinct
QUANTILE_ACC = 10000  # percentile_approx accuracy knob (err <= 1/ACC)


@register("sketch_hll_user_cardinality", oracle=None)
def sketch_hll_user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via HLL++ (approx_count_distinct)
    next to the exact answer. At scale the exact column is the one you
    drop: count_distinct shuffles every (type, user) pair, the sketch
    merges fixed 2^p-byte registers. Both here so the error is visible
    (and test-pinned at rel_err <= 3*rsd)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register("sketch_quantile_order_values", oracle=None)
def sketch_quantile_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of order value per status via percentile_approx
    (Greenwald-Khanna sketch; single pass, mergeable, bounded memory)
    against the exact percentile. The exact form requires a full sort per
    group — the sketch is what survives a 10^12-row table."""
    o = load_tables(spark, sf_dir, ["orders"])["orders"]
    approx = F.percentile_approx(
        "o_totalprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), QUANTILE_ACC
    )
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.round(approx[0], 2).alias("p50_approx"),
            F.round(approx[1], 2).alias("p90_approx"),
            F.round(approx[2], 2).alias("p99_approx"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50_exact"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90_exact"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 2).alias("p99_exact"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


THETA_LG_K = 14


@register("sketch_theta_event_overlap", oracle=None)
def sketch_theta_event_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET ALGEBRA over user populations: estimate the
    distinct viewers, distinct purchasers, their union, and their
    INTERSECTION (viewers who also purchased) from two independently
    built sketches — next to the exact answers.

    This is the sketch capability HLL lacks (HLL unions but cannot
    intersect); at 100 TB the two sketches are built in one pass per
    event partition and merged as fixed-size state, where the exact
    intersection needs a shuffle-heavy semi-join of the two key sets.
    Accuracy is test-pinned (<= 5% on this corpus's cardinalities)."""
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    sk = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "view", F.col("user_id")),
            F.lit(THETA_LG_K),
        ).alias("sk_view"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id")),
            F.lit(THETA_LG_K),
        ).alias("sk_buy"),
    )
    est = sk.select(
        F.theta_sketch_estimate("sk_view").alias("approx_viewers"),
        F.theta_sketch_estimate("sk_buy").alias("approx_buyers"),
        F.theta_sketch_estimate(
            F.theta_union("sk_view", "sk_buy")
        ).alias("approx_either"),
        F.theta_sketch_estimate(
            F.theta_intersection("sk_view", "sk_buy")
        ).alias("approx_both"),
    )
    exact = ev.agg(
        F.count_distinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("exact_viewers"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_buyers"),
        F.count_distinct(
            F.when(
                F.col("event_type").isin("view", "purchase"), F.col("user_id")
            )
        ).alias("exact_either"),
    )
    return est.crossJoin(exact)


CMS_EPS = 0.001
CMS_CONF = 0.99


@register("sketch_cms_part_frequency", oracle=None)
def sketch_cms_part_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the 10 hottest parts in
    lineitem, next to exact counts. The CMS is built in ONE aggregate
    over the full table (fixed eps/confidence state, mergeable
    map-side); point queries come from the serialized sketch on the
    driver. The heavy-hitter report a 100 TB ingest pass keeps is this
    sketch, not the exact groupBy. CMS guarantees estimate >= exact and
    estimate <= exact + eps*N w.h.p. — both bounds test-pinned."""
    import pandas as pd

    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    exact_top = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("l_partkey"))
        .limit(10)
    )
    sketch_bytes = li.agg(
        F.count_min_sketch(
            "l_partkey", F.lit(CMS_EPS), F.lit(CMS_CONF), F.lit(42)
        ).alias("cms")
    ).collect()[0]["cms"]
    # point-query the sketch driver-side (the sketch IS the shipped
    # artifact at scale); CountMinSketch java object via the JVM gateway
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(sketch_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    rows = exact_top.collect()
    pdf = pd.DataFrame(
        {
            "l_partkey": [r["l_partkey"] for r in rows],
            "exact_n": [r["exact_n"] for r in rows],
            "cms_n": [int(cms.estimateCount(int(r["l_partkey"]))) for r in rows],
        }
    )
    return spark.createDataFrame(pdf).orderBy(
        F.desc("exact_n"), F.asc("l_partkey")
    )
