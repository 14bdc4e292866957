"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship KG pipeline over sf0.001 documents + the
                 deterministic fixture corpus; returns resolved triples.
queries()      — every implemented operator from SURVEY.md §2
                 (blarify_spark.operators registry).
oracle_sql()   — DuckDB twins for the SQL-expressible subset; hash/UDF
                 dependent ops (KG pipeline, MinHash/SimHash/LSH) are
                 rows-only and pinned by the pytest suite instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full KG construction (extract -> link -> triples).

    Loads sf0.001 documents.parquet as extra web-text pages (wrapped in
    deterministic HTML) alongside the fixture corpus, runs the pipeline,
    and returns the entity-resolved triple table.
    """
    from pyspark.sql import functions as F

    from blarify_spark.session import ensure_workers_can_import

    ensure_workers_can_import(spark)

    from blarify_spark import corpus
    from blarify_spark.plans.extract import (
        extract_all_stage,
        mentions_from,
        triples_from,
    )
    from blarify_spark.plans.linking import resolve_triples
    from blarify_spark.sources.alias import alias_dict
    from blarify_spark.sources.pages import pages_from_rows

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc_pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.concat(
            F.lit("<html><head><title>doc</title></head><body><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
        F.lit("sf_documents").alias("family"),
    )
    fixture = pages_from_rows(spark, corpus.generate_pages(64))
    pages = fixture.unionByName(doc_pages)

    # persist: `extracted` feeds BOTH triples_from and mentions_from in the
    # returned plan, and without it the Arrow extraction UDF would run
    # twice per page. Deliberately NOT unpersisted — the returned (lazy)
    # DataFrame still depends on it and the driver collects then exits;
    # long-lived sessions use run_pipeline, whose stages materialize to
    # parquet instead of executor storage.
    extracted = extract_all_stage(pages).persist()
    return resolve_triples(
        triples_from(extracted), mentions_from(extracted), alias_dict(spark)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from blarify_spark.operators.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from blarify_spark.operators.registry import all_oracles

    return all_oracles()
