"""Similarity search over the `embeddings` table (array<float> column).

The vector-query surface (blarify queries.py:2298-2356 — Neo4j vector
index top-k + hybrid fusion) restated in Spark: brute-force cosine via
native zip_with/aggregate as the exactness baseline, and a
random-hyperplane LSH bucketing as the scale path (probe only matching
buckets instead of all N vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from blarify_spark.functions.vector import cosine
from blarify_spark.operators.registry import register
from blarify_spark.sources.tables import load_tables

TOP_K = 10
NEARDUP_COS = 0.95
PLANES = 8  # LSH hyperplanes -> 2^8 buckets


def _query_vec(spark: SparkSession, sf_dir: str):
    """The deterministic query vector: embedding of vec_id = 0."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    return emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec")
    )


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           ROUND(list_cosine_similarity(embedding, qvec), 6) AS cos_sim
    FROM embeddings, q
    WHERE vec_id <> 0
    ORDER BY cos_sim DESC, vec_id
    LIMIT {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (blarify queries.py:2298-2319 analog).

    Exact baseline: one pass, no shuffle except the final top-k sort —
    TakeOrderedAndProject keeps it O(k) memory per partition.
    """
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    q = _query_vec(spark, sf_dir)
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(cosine("embedding", "qvec"), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "embedding_neardup_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.embedding, b.embedding), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 100 AND b.vec_id < 100
      AND list_cosine_similarity(a.embedding, b.embedding) >= {NEARDUP_COS}
    ORDER BY vec_a, vec_b
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (bounded slice keeps the O(n^2)
    baseline honest; the LSH path below is the scale answer)."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    small = emb.filter(F.col("vec_id") < 100)
    a = small.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = small.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = cosine("ea", "eb")
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", F.round(cos, 6))
        .filter(cos >= NEARDUP_COS)
        .select("vec_a", "vec_b", "cos_sim")
        .orderBy("vec_a", "vec_b")
    )


def _lsh_bucket(vec_col) -> F.Column:  # noqa: ANN001
    """Random-hyperplane LSH bucket id, fully native and deterministic.

    Plane p's component i is +-1 from xxhash64(p, i); bit p of the bucket
    is sign(dot(v, plane_p)). Deterministic across engines runs (but
    xxhash-derived, so validated by pytest recall tests, not DuckDB).
    """
    bucket = F.lit(0)
    for p in range(PLANES):
        dot_p = F.aggregate(
            F.zip_with(
                vec_col,
                F.transform(
                    F.sequence(F.lit(0), F.size(vec_col) - 1),
                    lambda i, p=None, _p=p: F.when(
                        F.shiftright(
                            F.xxhash64(F.lit(_p), i), 1
                        ).bitwiseAND(F.lit(1))
                        == 1,
                        F.lit(1.0),
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda v, s: v * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_p > 0, F.lit(1 << p)).otherwise(0)
    return bucket


@register("ann_lsh_topk", oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k: probe only vectors sharing >= 1 of
    the query's band buckets (here: hamming-adjacent buckets via 2 probes),
    then exact cosine re-rank. The 10^12-scale path: the bucket equi-join
    replaces the full scan. Recall vs ann_cosine_topk pinned by pytest."""
    emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    with_bucket = emb.withColumn("bucket", _lsh_bucket(F.col("embedding")))
    qrow = with_bucket.filter(F.col("vec_id") == 0).select(
        F.col("bucket").alias("qbucket"), F.col("embedding").alias("qvec")
    )
    # multiprobe: exact bucket or hamming-1 neighbors (xor with one bit)
    probes = qrow.select(
        "qvec",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << p))
                    for p in range(PLANES)
                ],
            )
        ).alias("bucket"),
    )
    return (
        with_bucket.filter(F.col("vec_id") != 0)
        .join(F.broadcast(probes), "bucket")
        .select(
            "vec_id",
            "label",
            F.round(cosine("embedding", "qvec"), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(TOP_K)
    )
