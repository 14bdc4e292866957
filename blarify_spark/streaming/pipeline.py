"""Streaming twin of the batch extraction pipeline.

A file-source stream of `pages` parquet runs the exact same
extract_text/triples stages (the UDFs and plans are stream-agnostic
because they are narrow per-row transforms), then aggregates triples per
tumbling hour with a watermark for late WARC timestamps.

Incremental ingestion semantics mirror blarify's updated-files path
(reference: blarify/project_graph_updater.py:61-69): files that appear in
the source directory after a checkpointed run are the ADDED set; the
checkpoint offset log plays the role of the diff classification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from blarify_spark.plans.extract import extract_text_stage, triples_stage
from blarify_spark.sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of pages (schema fixed; no inference)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def streaming_triples(pages_stream: DataFrame) -> DataFrame:
    """Per-page extraction on a stream — identical plan to batch."""
    return triples_stage(extract_text_stage(pages_stream))


def streaming_triple_counts(
    pages_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Windowed triple counts with late-data watermark."""
    t = streaming_triples(pages_stream)
    return (
        t.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), F.col("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "pred",
            "n",
        )
    )


def run_available_now(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently available, then stop (batch-like run).

    Checkpointed: a second invocation after new files arrive processes
    only the new files (exactly-once incremental ingest).
    """
    q = (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .start()
    )
    q.awaitTermination()
