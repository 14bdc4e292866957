"""Data-mixture curation operators over the `documents` table.

Training pipelines don't just score documents — they assemble a MIX:
per-source token budgets, deterministic selection so two runs of the
pipeline pick the same documents, and exact token accounting. This
module provides the budgeted-downsampling step (the companion to the
row-rate `stratified_sample_orders` in relational.py: that one samples
by row probability; this one fills a per-source TOKEN budget in a
deterministic hash order, which is how pretraining mixes are actually
specified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from blarify_spark.functions.partitioning import fan_out
from blarify_spark.operators.registry import register
from blarify_spark.sources.tables import load_tables


@register(
    "datamix_token_budget",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0))
                  AS INT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), tot AS (
      SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
      FROM tok GROUP BY source
    ), cum AS (
      SELECT t.doc_id, t.source, t.n_tokens,
             CAST(SUM(t.n_tokens) OVER (
               PARTITION BY t.source ORDER BY t.h, t.doc_id
             ) AS BIGINT) AS cum_tokens,
             tt.src_tokens AS src_tokens
      FROM tok t JOIN tot tt ON tt.source = t.source
    )
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM cum
    WHERE cum_tokens * 2 <= src_tokens
    ORDER BY source, doc_id
    """,
)
def datamix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source token-budget downsampling: keep documents
    from each source, in md5(doc_id) hash order, while the running token
    total stays within half the source's total tokens (a 50% token-budget
    mix). Emits the kept docs with their token count and running total.

    Determinism: the selection order is a pure function of doc_id (md5,
    tie-broken by doc_id), so re-runs — and the DuckDB oracle — pick the
    identical document set; the budget test is exact integer arithmetic
    (cum * 2 <= total), immune to float association.

    Scale: one groupBy(source) for the budgets (broadcast back — sources
    are few), one window per source for the running sum. A skewed source
    serializes its own window at 100 TB; the scale path is a two-phase
    per-partition-presum + offset join on the same hash order, which
    preserves this exact semantics because the order key is total."""
    t = load_tables(spark, sf_dir, ["documents"])
    toks = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    base = fan_out(t["documents"]).select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    tot = base.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    cum = base.join(F.broadcast(tot), "source").withColumn(
        "cum_tokens", F.sum("n_tokens").over(w)
    )
    return (
        cum.filter(F.col("cum_tokens") * 2 <= F.col("src_tokens"))
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .orderBy("source", "doc_id")
    )
