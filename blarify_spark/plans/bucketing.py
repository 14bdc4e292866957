"""Bucketed tables — co-located joins without per-query shuffles.

SURVEY.md §2.6 names bucketing as the co-location strategy for the
engine's biggest repeated join (edges ⋈ nodes on entity id — blarify
re-resolves endpoints on every save, neo4j_manager.py:102-122). At 100 TB
that join must not shuffle both sides on every query: writing both tables
bucketed (and sorted) by the join key makes every subsequent equi-join on
that key shuffle-free — SortMergeJoin directly over co-located buckets.

Bucket count is a storage-layout decision: pick ~(table size / 256 MB)
rounded to a power of two, identical on both join sides (Spark requires
compatible bucket counts to elide the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist df as a managed parquet table bucketed by `key`.

    Sorted buckets additionally elide the per-task Sort under a
    SortMergeJoin, leaving a pure streaming merge.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, key_l: str, key_r: str
) -> DataFrame:
    """Equi-join two tables bucketed on their join keys — shuffle-free
    when both were written with compatible bucket counts."""
    lt, rt = spark.table(left), spark.table(right)
    return lt.join(rt, lt[key_l] == rt[key_r])
