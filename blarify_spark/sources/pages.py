"""The `pages` input table (BASELINE.json `input_hint` shape).

    pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

In production this is an Iceberg table partitioned by days(warc_ts) and
lang so that Catalyst's predicate pushdown becomes partition pruning —
the Spark analog of blarify's scan-side skip rules
(reference: blarify/project_file_explorer/project_files_iterator.py:39-100).
In the sandbox we read/write parquet with the same partitioning; the DDL
is identical modulo `USING iceberg`.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("family", T.StringType(), True),  # fixture provenance
    ]
)

# Scan-side ingestion policy (S2 analog): cap page size like blarify's
# 0.8 MB max file size (project_files_iterator.py:21).
MAX_HTML_BYTES = 800_000


def pages_from_rows(spark: SparkSession, rows: list[dict[str, Any]]) -> DataFrame:
    """Fixture corpus rows -> DataFrame with the canonical schema."""
    data = [
        (r["url"], r["warc_ts"], r["html"], r.get("text"), r["lang"], r.get("family"))
        for r in rows
    ]
    return spark.createDataFrame(data, schema=PAGES_SCHEMA)


def scan_pages(
    df: DataFrame,
    langs: list[str] | None = None,
    url_skiplist: list[str] | None = None,
) -> DataFrame:
    """Scan-side filters, kept BEFORE any UDF so Catalyst pushes them into
    the file scan (S2) — skip-by-size, language filter, ignore-list
    (S3: broadcast NOT IN for small lists)."""
    out = df.filter(
        F.col("html").isNotNull() & (F.length("html") <= MAX_HTML_BYTES)
    )
    if langs:
        out = out.filter(F.col("lang").isin(langs))
    if url_skiplist:
        out = out.filter(~F.col("url").isin(url_skiplist))
    return out


def write_pages(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partition by lang (low-cardinality; warc day added at scale)."""
    df.write.mode(mode).partitionBy("lang").parquet(path)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
