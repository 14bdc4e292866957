"""Arrow-batched pandas UDFs — the engine's entire Python surface.

Exactly the five UDFs SURVEY.md §2.7 allows; everything else in the engine
is native Catalyst column expressions. Each UDF delegates per-element work
to the pure-Python reference module (blarify_spark.ref) so the Spark path
and the golden path share one implementation — byte-identical by
construction, with Arrow round-tripping being the only thing parity tests
must additionally prove (BASELINE.json `input_hint`).

No row-at-a-time Python UDFs anywhere: these are vectorized
``pandas_udf``s fed by Arrow record batches
(spark.sql.execution.arrow.maxRecordsPerBatch controls batch shape).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T

from blarify_spark.ref.html_extract import extract_text_bytes
from blarify_spark.ref.triples import extract_mentions, extract_triples

# ---------------------------------------------------------------------------
# Result schemas
# ---------------------------------------------------------------------------

TRIPLE_STRUCT = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("span_start", T.IntegerType(), False),
        T.StructField("span_end", T.IntegerType(), False),
        T.StructField("sentence_idx", T.IntegerType(), False),
    ]
)

MENTION_STRUCT = T.StructType(
    [
        T.StructField("surface", T.StringType(), False),
        T.StructField("span_start", T.IntegerType(), False),
        T.StructField("span_end", T.IntegerType(), False),
        T.StructField("sentence_idx", T.IntegerType(), False),
        T.StructField("ctx", T.StringType(), False),
    ]
)

# Enriched mention (single-pass path): context tokens + embedding computed
# in the same Python crossing, so the linking stage is pure JVM. The raw
# ctx sentence is NOT carried (tokens subsume it for scoring) — it is
# ~60% of mention bytes and would inflate every downstream persist and
# shuffle.
MENTION_FULL_STRUCT = T.StructType(
    [
        T.StructField("surface", T.StringType(), False),
        T.StructField("span_start", T.IntegerType(), False),
        T.StructField("span_end", T.IntegerType(), False),
        T.StructField("sentence_idx", T.IntegerType(), False),
        T.StructField("m_tokens", T.ArrayType(T.StringType()), False),
        T.StructField("m_embedding", T.ArrayType(T.FloatType()), False),
    ]
)

# One-crossing page extraction result (SURVEY.md E1-E3 + E6 in a single
# Arrow UDF): html bytes enter Python exactly once per page.
# text_skeleton is the E6 skeletonize output (each fact sentence replaced
# by a hashed placeholder line, blarify definition_node.py:100-138).
PAGE_EXTRACT_STRUCT = T.StructType(
    [
        T.StructField("text", T.StringType(), False),
        T.StructField("mentions", T.ArrayType(MENTION_FULL_STRUCT), False),
        T.StructField("triples", T.ArrayType(TRIPLE_STRUCT), False),
        T.StructField("text_skeleton", T.StringType(), False),
    ]
)


# ---------------------------------------------------------------------------
# UDF 1: HTML -> text (the byte-identical invariant)
# ---------------------------------------------------------------------------


@F.pandas_udf(T.StringType())
def _extract_text_udf(html: pd.Series) -> pd.Series:
    """binary html -> extracted text; '' on decode failure (RAW policy)."""
    return html.map(extract_text_bytes)


# The function IS deterministic; the flag exists solely to stop Catalyst's
# CollapseProject from inlining (= re-evaluating) the expensive UDF into
# every downstream reference — with it, the plan evaluates extraction
# exactly once and consumers read the projected attribute.
extract_text_udf = _extract_text_udf.asNondeterministic()


# ---------------------------------------------------------------------------
# UDF 2: text -> array<struct> of SVO triples
# ---------------------------------------------------------------------------


def _triples_of(text: str | None, lang: str | None = "en") -> list[tuple]:
    if not text:
        return []
    return [
        (t["subj"], t["pred"], t["obj"], t["start"], t["end"], t["sentence_idx"])
        for t in extract_triples(text, lang or "en")
    ]


@F.pandas_udf(T.ArrayType(TRIPLE_STRUCT))
def extract_triples_udf(text: pd.Series, lang: pd.Series) -> pd.Series:
    return pd.Series([_triples_of(t, g) for t, g in zip(text, lang)])


# ---------------------------------------------------------------------------
# UDF 3: text -> array<struct> of entity mentions
# ---------------------------------------------------------------------------


def _mentions_of(text: str | None) -> list[tuple]:
    if not text:
        return []
    return [
        (m["surface"], m["start"], m["end"], m["sentence_idx"], m["ctx"])
        for m in extract_mentions(text)
    ]


@F.pandas_udf(T.ArrayType(MENTION_STRUCT))
def extract_mentions_udf(text: pd.Series) -> pd.Series:
    return text.map(_mentions_of)


# ---------------------------------------------------------------------------
# UDF 1+2+3 fused: html -> (text, mentions+embeddings, triples) in ONE
# Python crossing — the hot-path production UDF. The separate UDFs above
# remain the parity/compat surface; this one is what run_pipeline uses.
# ---------------------------------------------------------------------------

_TOKEN_RE = None


def _ctx_tokens(ctx: str) -> list[str]:
    global _TOKEN_RE
    if _TOKEN_RE is None:
        import re

        _TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
    return [t.lower() for t in _TOKEN_RE.findall(ctx)]


def _extract_all_of(row: tuple) -> tuple:
    from blarify_spark.corpus import pseudo_embedding
    from blarify_spark.ref.triples import skeletonize_text

    html, pretext, lang = row
    text = pretext if pretext else extract_text_bytes(html)
    mentions = []
    for m in extract_mentions(text):
        toks = _ctx_tokens(m["ctx"])
        mentions.append(
            (
                m["surface"],
                m["start"],
                m["end"],
                m["sentence_idx"],
                toks,
                pseudo_embedding(toks),
            )
        )
    triples = [
        (t["subj"], t["pred"], t["obj"], t["start"], t["end"], t["sentence_idx"])
        for t in extract_triples(text, lang or "en")
    ]
    skeleton = skeletonize_text(text, [(t[3], t[4]) for t in triples])
    return (text, mentions, triples, skeleton)


@F.pandas_udf(PAGE_EXTRACT_STRUCT)
def _extract_all_udf(
    html: pd.Series, text: pd.Series, lang: pd.Series
) -> pd.DataFrame:
    out = [_extract_all_of(row) for row in zip(html, text, lang)]
    return pd.DataFrame(
        out, columns=["text", "mentions", "triples", "text_skeleton"]
    )


extract_all_udf = _extract_all_udf.asNondeterministic()  # single-eval barrier


# ---------------------------------------------------------------------------
# UDF 4: context tokens -> deterministic pseudo-embedding (dim 16)
# ---------------------------------------------------------------------------
# The embedding model is a stub boundary: in production this is a real
# encoder service (blarify analog: services/embedding_service.py:109-144,
# dim-1536 vectors, content-hash cached). Here it is the same deterministic
# hash embedding the alias dictionary uses, so cosine scoring is exact and
# test-reproducible. The Spark plumbing (Arrow batch in, array<float> out)
# is identical either way.


@F.pandas_udf(T.ArrayType(T.FloatType()))
def ctx_embedding_udf(tokens: pd.Series) -> pd.Series:
    from blarify_spark.corpus import pseudo_embedding

    return tokens.map(
        lambda toks: pseudo_embedding([] if toks is None else list(toks))
    )
