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
