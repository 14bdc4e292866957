"""Scan-width guard for compute-heavy stages.

A small parquet table (one file, one row group) reads as ONE input split,
so any expensive per-row stage built directly on the scan — shingling,
minhash signatures, simhash bit votes — runs on a single core no matter
how many the session has. At production scale the same table arrives as
thousands of splits and the scan is already wide, so an unconditional
`repartition()` would add a pointless full shuffle of the raw payload.

`fan_out` bridges the two regimes: it repartitions up to the session's
default parallelism ONLY when the current partition count is below it,
and is the identity otherwise. The check reads the physical plan's
partitioning (no job is triggered). Results are unaffected — callers
aggregate, join, or sort downstream, so row placement is immaterial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Widen `df` to the session default parallelism if it is narrower.

    With `cols`, the widening shuffle hash-partitions on those columns
    (useful when a downstream aggregate keys on them — the exchange is
    then reusable); without, round-robin for even load.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def fan_in(df: DataFrame) -> DataFrame:
    """Narrow a finely-split input to the session parallelism before a
    Python-boundary stage — the mirror of `fan_out`.

    Every Arrow/pandas-UDF task pays a fixed JVM<->Python round-trip
    latency regardless of row count (measured ~0.2-0.3 s per task wave on
    this host: a 128-task identity pandas UDF over 12k tiny rows costs
    ~1.2 s vs ~0.4 s at 32 tasks and ~0.1 s for the same stage JVM-side).
    When the input is split into many more partitions than the session
    has cores AND the split is fine-grained (the tiny-task regime), a
    `coalesce` to the core count removes that overhead without losing any
    parallelism. coalesce merges adjacent partitions with NO shuffle, and
    results are unaffected (callers aggregate/join downstream).

    The guard is two-sided: wide production scans (partitions far above
    cores because the DATA is large) keep their granularity — there each
    task does seconds of work and the boundary latency is amortized, while
    merging would inflate per-task state and retry cost. Only inputs
    within FAN_IN_MAX_RATIO x parallelism are folded.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    n = df.rdd.getNumPartitions()
    if target < n <= FAN_IN_MAX_RATIO * target:
        return df.coalesce(target)
    return df


# Inputs split into more than this many partitions per core are treated
# as genuinely wide (large data) and left alone by fan_in.
FAN_IN_MAX_RATIO = 8
