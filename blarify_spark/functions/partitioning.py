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


# A `fan_in` mirror of fan_out (coalesce finely-split inputs to the core
# count before a Python-boundary stage) was prototyped in round 6 and
# REJECTED: it halved the tiny-page extract stage (fixed ~0.2-0.3 s
# JVM<->Python latency per Arrow task dominates there) but lost 25% wall
# on the heavy-page 8-core scaling arm, where fat single-wave tasks push
# multi-thousand-row Arrow batches and lose wave-level smoothing. Task
# weight is unknowable at plan time; callers that know their weight pick
# the split (OPTIMIZATION_r06.md has the A/B numbers).
