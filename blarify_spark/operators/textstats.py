"""Text-analysis operators over the `documents` table.

The training-data text-quality family (task brief): language-ID, quality
scoring, token counting, fingerprinting — each as native Catalyst
expressions with a DuckDB oracle twin. No UDFs: these run inside
whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from blarify_spark.operators.registry import register
from blarify_spark.functions.partitioning import fan_out
from blarify_spark.sources.tables import load_tables

# Tiny deterministic stopword banks for the n-gram language heuristic.
STOP_EN = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
STOP_DE = ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "auf"]
STOP_FR = ["le", "la", "les", "et", "est", "de", "un", "une", "dans", "pour"]


def _tokens(col):  # noqa: ANN001
    return F.filter(F.split(col, " "), lambda t: F.length(t) > 0)


def _hits(col, words: list[str]):  # noqa: ANN001
    return F.size(F.filter(_tokens(col), lambda t: t.isin(*words)))


def _sql_hits(expr: str, words: list[str]) -> str:
    quoted = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(list_filter(string_split({expr}, ' '), x -> x <> ''),"
        f" x -> list_contains([{quoted}], x)))"
    )


@register(
    "text_token_counts",
    oracle="""
    SELECT doc_id,
      len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws_tokens,
      len(regexp_extract_all(text, '[a-z0-9]+')) AS n_re_tokens,
      length(text) AS n_chars
    FROM documents ORDER BY doc_id
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + regex ('BPE-ish' word piece) token counting."""
    t = load_tables(spark, sf_dir, ["documents"])
    return fan_out(t["documents"]).select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).alias(
            "n_re_tokens"
        ),
        F.length("text").alias("n_chars"),
    ).orderBy("doc_id")


@register(
    "text_winnowing_fingerprints",
    oracle="""
    WITH g AS (
      SELECT doc_id,
        list_transform(generate_series(1, length(text) - 4),
                       i -> md5(substr(text, i, 5))) AS hs
      FROM documents WHERE length(text) >= 8
    ), w AS (
      SELECT doc_id,
        list_distinct(list_transform(generate_series(1, len(hs) - 3),
                                     j -> list_min(hs[j:j+3]))) AS fps
      FROM g
    )
    SELECT doc_id, len(fps) AS n_fingerprints, list_min(fps) AS min_fp
    FROM w ORDER BY doc_id
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting by rolling-hash winnowing (the MOSS
    scheme): hash every char-5-gram, slide a window of 4 hashes, keep the
    window minimum — the distinct minima are the document's fingerprints.
    Guarantees any shared substring of length >= 8 yields a shared
    fingerprint. md5 as the gram hash keeps Spark and DuckDB bit-equal
    (engine hashes like xxhash64 are not portable)."""
    t = load_tables(spark, sf_dir, ["documents"])
    text = F.col("text")
    hs = F.transform(
        F.sequence(F.lit(1), F.length(text) - 4),
        lambda i: F.md5(text.substr(i, F.lit(5))),
    )
    d = (
        fan_out(t["documents"])
        .filter(F.length("text") >= 8)
        .select("doc_id", hs.alias("hs"))
    )
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - 3),
            lambda j: F.array_min(F.slice("hs", j, 4)),
        )
    )
    return (
        d.select("doc_id", fps.alias("fps"))
        .select(
            "doc_id",
            F.size("fps").alias("n_fingerprints"),
            F.array_min("fps").alias("min_fp"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_structure_stats",
    oracle="""
    WITH s AS (
      SELECT doc_id,
        list_transform(
          list_filter(string_split(text, '.'), x -> trim(x) <> ''),
          x -> len(list_filter(string_split(trim(x), ' '), y -> y <> ''))
        ) AS toks
      FROM documents
    )
    SELECT doc_id, len(toks) AS n_sentences,
           list_max(toks) AS max_toks, list_min(toks) AS min_toks,
           ROUND(list_sum(toks) * 1.0 / len(toks), 6) AS avg_toks,
           ROUND(sqrt(
             list_sum(list_transform(toks, v -> v * v)) * 1.0 / len(toks)
             - (list_sum(toks) * 1.0 / len(toks))
               * (list_sum(toks) * 1.0 / len(toks))
           ), 6) AS sd_toks
    FROM s WHERE len(toks) > 0
    ORDER BY doc_id
    """,
)
def text_structure_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 analog (blarify stats/complexity.py:22-80 nesting-depth
    max/min/mean/sd per definition): per-document sentence-structure
    stats — max/min/avg/sd of per-sentence token counts, computed from
    exact integer sums so Spark and DuckDB agree bit-for-bit."""
    t = load_tables(spark, sf_dir, ["documents"])
    sents = F.filter(
        F.split("text", r"\."), lambda x: F.length(F.trim(x)) > 0
    )
    toks = F.transform(
        sents,
        lambda x: F.size(
            F.filter(F.split(F.trim(x), " "), lambda y: F.length(y) > 0)
        ),
    )
    d = fan_out(t["documents"]).select("doc_id", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    n = F.size("toks").cast("long")
    sm = F.aggregate("toks", F.lit(0).cast("long"), lambda a, v: a + v)
    sq = F.aggregate(
        "toks", F.lit(0).cast("long"), lambda a, v: a + v.cast("long") * v
    )
    mean = sm * F.lit(1.0) / n
    return d.select(
        "doc_id",
        F.size("toks").alias("n_sentences"),
        F.array_max("toks").alias("max_toks"),
        F.array_min("toks").alias("min_toks"),
        F.round(mean, 6).alias("avg_toks"),
        F.round(
            F.sqrt(sq * F.lit(1.0) / n - mean * mean), 6
        ).alias("sd_toks"),
    ).orderBy("doc_id")


@register(
    "content_hash_cache",
    oracle="""
    WITH h AS (
      SELECT doc_id, md5(text) AS content_hash,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS feat
      FROM documents
    )
    SELECT content_hash, COUNT(*) AS n_docs_served,
           MIN(doc_id) AS sample_doc, MAX(feat) AS tok_feat
    FROM h GROUP BY content_hash
    ORDER BY content_hash
    """,
)
def content_hash_cache(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-before-expensive-compute: the content-hash embedding cache
    pattern (blarify services/embedding_service.py:109-144 — embed each
    distinct content hash once, fan results back out to every holder).

    Plan shape is the pattern itself: dropDuplicates(content_hash) ->
    compute the feature ONCE per distinct content -> re-join to all
    docs. The 'expensive' step here is a native expression so the DuckDB
    oracle can verify it; swapping in ctx_embedding_udf keeps the exact
    same plan (tests/test_sinks_cache.py pins that the UDF-side input is
    the deduped set, not the corpus).
    """
    t = load_tables(spark, sf_dir, ["documents"])
    hashed = fan_out(t["documents"]).select(
        "doc_id", F.md5("text").alias("content_hash"), "text"
    )
    distinct = hashed.select("content_hash", "text").dropDuplicates(
        ["content_hash"]
    )
    feats = distinct.select(
        "content_hash", F.size(_tokens(F.col("text"))).alias("feat")
    )
    served = hashed.drop("text").join(feats, "content_hash")
    return (
        served.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs_served"),
            F.min("doc_id").alias("sample_doc"),
            F.max("feat").alias("tok_feat"),
        )
        .orderBy("content_hash")
    )


@register(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
      ROUND({_sql_hits('text', STOP_EN)} * 1.0
        / GREATEST(len(list_filter(string_split(text, ' '), x -> x <> '')), 1),
        6) AS stopword_ratio,
      ROUND(len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1.0
        / GREATEST(length(text), 1), 6) AS punct_ratio,
      CASE WHEN length(text) BETWEEN 50 AND 5000 THEN 1 ELSE 0 END AS len_ok
    FROM documents ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword quality features (the Gopher-style
    heuristic family as columns)."""
    t = load_tables(spark, sf_dir, ["documents"])
    n_tok = F.greatest(F.size(_tokens(F.col("text"))), F.lit(1))
    return fan_out(t["documents"]).select(
        "doc_id",
        F.round(_hits(F.col("text"), STOP_EN) / n_tok, 6).alias("stopword_ratio"),
        F.round(
            F.size(F.expr("regexp_extract_all(text, '[^a-z0-9 ]', 0)"))
            / F.greatest(F.length("text"), F.lit(1)),
            6,
        ).alias("punct_ratio"),
        F.when(F.length("text").between(50, 5000), 1).otherwise(0).alias("len_ok"),
    ).orderBy("doc_id")


@register(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang,
      CASE
        WHEN {_sql_hits('text', STOP_DE)} > {_sql_hits('text', STOP_EN)}
         AND {_sql_hits('text', STOP_DE)} > {_sql_hits('text', STOP_FR)} THEN 'de'
        WHEN {_sql_hits('text', STOP_FR)} > {_sql_hits('text', STOP_EN)}
         AND {_sql_hits('text', STOP_FR)} >= {_sql_hits('text', STOP_DE)} THEN 'fr'
        ELSE 'en'
      END AS pred_lang
    FROM documents ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID with a deterministic tie policy."""
    t = load_tables(spark, sf_dir, ["documents"])
    en = _hits(F.col("text"), STOP_EN)
    de = _hits(F.col("text"), STOP_DE)
    fr = _hits(F.col("text"), STOP_FR)
    pred = (
        F.when((de > en) & (de > fr), "de")
        .when((fr > en) & (fr >= de), "fr")
        .otherwise("en")
    )
    return fan_out(t["documents"]).select(
        "doc_id", "lang", pred.alias("pred_lang")
    ).orderBy("doc_id")


@register(
    "text_fingerprints",
    oracle="""
    SELECT doc_id,
      md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint,
      substr(md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))), 1, 8)
        AS short_fp
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (content-equivalence analog,
    blarify definition_node.py:167-172: regex-normalize then hash)."""
    t = load_tables(spark, sf_dir, ["documents"])
    norm = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " ")))
    return fan_out(t["documents"]).select(
        "doc_id", norm.alias("fingerprint"), F.substring(norm, 1, 8).alias("short_fp")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Grouped-map UDF (applyInPandas) demonstration with an exact oracle
# ---------------------------------------------------------------------------


@register(
    "events_user_drawdown",
    oracle="""
    SELECT user_id, event_id,
      MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - value AS drawdown
    FROM events
    """,
)
def events_user_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running-max drawdown via applyInPandas (grouped-map UDF,
    SURVEY.md §2.6 UDF row). Running max is exact (no float
    reassociation), so the pandas path and the SQL window oracle agree
    bit-for-bit. In production this slot hosts per-group logic SQL can't
    express (custom sequential models); here the point is the plumbing:
    shuffle by group key, Arrow batch per group, schema-stable output.
    """
    import pandas as pd
    from pyspark.sql import types as T

    t = load_tables(spark, sf_dir, ["events"])

    def _drawdown(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        run_max = pdf["value"].cummax()
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "drawdown": run_max - pdf["value"],
            }
        )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("drawdown", T.DoubleType()),
        ]
    )
    return (
        t["events"]
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_drawdown, schema=schema)
    )


@register(
    "tfidf_top_terms",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                        x -> x <> '')) AS w
      FROM documents
    ), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM words),
    stats AS (
      SELECT w, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS total_tf
      FROM words GROUP BY w
    )
    SELECT w, doc_freq, total_tf,
           CAST(total_tf AS DOUBLE) * (SELECT n_docs FROM n) / doc_freq
             AS df_scaled_tf
    FROM stats
    ORDER BY df_scaled_tf DESC, w
    LIMIT 50
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics with a tf-idf-style score: per term,
    document frequency, total term frequency, and total_tf * N / df — a
    df-normalized frequency that is rank-equivalent to tf-idf for fixed
    N while staying EXACT (int-ratio in float64, so the DuckDB oracle
    matches bit-for-bit; a log-based idf can differ in the last ulp
    between libm implementations). One explode + two aggregations, all
    codegen; the per-term shuffle is keyed by the term (uniform at web
    scale after lowercasing), and the top-50 is a TakeOrdered, never a
    global sort."""
    t = load_tables(spark, sf_dir, ["documents"])
    words = fan_out(t["documents"]).select(
        "doc_id", F.explode(_tokens(F.lower(F.col("text")))).alias("w")
    )
    n_docs = words.select("doc_id").distinct().count()
    stats = words.groupBy("w").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("total_tf"),
    )
    return (
        stats.select(
            "w",
            "doc_freq",
            "total_tf",
            (
                F.col("total_tf").cast("double")
                * F.lit(n_docs)
                / F.col("doc_freq")
            ).alias("df_scaled_tf"),
        )
        .orderBy(F.col("df_scaled_tf").desc(), "w")
        .limit(50)
    )


# Context-window budget for sequence packing (tokens per training chunk).
PACK_BUDGET = 256


@register(
    "pack_documents_into_contexts",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
             len(list_filter(string_split(text, ' '), x -> x <> ''))
               AS n_tokens
      FROM documents
    ), r AS (
      SELECT doc_id, shard, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS endpos
      FROM d
    )
    SELECT doc_id, shard, n_tokens,
           endpos - n_tokens AS start_offset,
           CAST(FLOOR((endpos - n_tokens) / {PACK_BUDGET}) AS BIGINT)
             AS chunk_id,
           CAST(FLOOR((endpos - 1) / {PACK_BUDGET}) AS BIGINT)
             <> CAST(FLOOR((endpos - n_tokens) / {PACK_BUDGET}) AS BIGINT)
             AS crosses_boundary
    FROM r ORDER BY shard, doc_id
    """,
)
def pack_documents_into_contexts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sequence packing for pretraining (concat-and-chunk): documents
    are laid end-to-end in deterministic order and cut into
    PACK_BUDGET-token context windows; each doc gets its shard, token
    count, start offset in the shard's token stream, owning chunk id,
    and whether it straddles a chunk boundary. Packing is PER SHARD
    (md5-prefix of doc_id, 16 shards) so the running-sum window is
    partitioned — no global single-task sort exists at any scale, and
    shards are independent units a 1000-executor job distributes
    freely; a global pack would serialize the corpus through one
    window. Deterministic end-to-end: shard, order, and offsets are
    pure functions of doc_id and text."""
    t = load_tables(spark, sf_dir, ["documents"])
    from pyspark.sql import Window as W

    d = fan_out(t["documents"]).select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).alias(
            "shard"
        ),
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    end = F.sum("n_tokens").over(w)
    start = (end - F.col("n_tokens")).alias("start_offset")
    chunk = F.floor((end - F.col("n_tokens")) / PACK_BUDGET).alias("chunk_id")
    last_chunk = F.floor((end - 1) / PACK_BUDGET)
    return d.select(
        "doc_id",
        "shard",
        "n_tokens",
        start,
        chunk,
        (last_chunk != F.floor((end - F.col("n_tokens")) / PACK_BUDGET)).alias(
            "crosses_boundary"
        ),
    ).orderBy("shard", "doc_id")
