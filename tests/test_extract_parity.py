"""Spark-vs-reference parity: the engine's core correctness invariants.

1. Extracted text is BYTE-IDENTICAL per url between the Arrow UDF path and
   the pure-Python reference extractor (BASELINE.json `input_hint`).
2. The (subj,pred,obj) multiset matches the reference exactly on the
   fixture corpus (P/R = 1.0 here; the >=0.95 gate allows slack only for
   linking-stage ambiguity, SURVEY.md §7 hard-parts).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from blarify_spark import corpus
from blarify_spark.plans.extract import (
    extract_text_stage,
    mentions_stage,
    triples_stage,
)
from blarify_spark.ref import extract_text_bytes, extract_triples


def test_text_byte_identical_per_url(spark, fixture_pages):
    got = {
        r["url"]: r["text"]
        for r in extract_text_stage(fixture_pages).select("url", "text").collect()
    }
    rows = corpus.generate_pages(64)
    assert len(got) == len(rows)
    for row in rows:
        expected = extract_text_bytes(row["html"])
        assert got[row["url"]] == expected, row["url"]
        # byte-level, not just str equality
        assert got[row["url"]].encode("utf-8") == expected.encode("utf-8")


def test_raw_status_for_undecodable_pages(spark, fixture_pages):
    status = {
        r["url"]: r["extract_status"]
        for r in extract_text_stage(fixture_pages)
        .select("url", "extract_status")
        .collect()
    }
    raw_urls = [u for u, s in status.items() if s == "raw"]
    assert len(raw_urls) == 2  # the two invalid-utf8 garbage pages
    assert all("raw_garbage" in u for u in raw_urls)
    # every fixture row is retained
    assert len(status) == 64


def test_triples_exact_multiset_parity(spark, fixture_pages):
    spark_triples = Counter(
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in triples_stage(extract_text_stage(fixture_pages)).collect()
    )
    expected = Counter()
    for row in corpus.generate_pages(64):
        text = extract_text_bytes(row["html"])
        for t in extract_triples(text, row["lang"]):
            expected[(row["url"], t["subj"], t["pred"], t["obj"])] += 1
    assert spark_triples == expected
    assert sum(expected.values()) > 100


def test_triples_provenance_spans_are_valid(spark, fixture_pages):
    joined = (
        triples_stage(extract_text_stage(fixture_pages))
        .join(
            extract_text_stage(fixture_pages).select("url", "text"), "url"
        )
        .select("subj", "pred", "obj", "span_start", "span_end", "text")
        .collect()
    )
    assert joined
    for r in joined:
        sent = r["text"][r["span_start"] : r["span_end"]]
        assert r["subj"] in sent


def test_mentions_deterministic_ids(spark, fixture_pages):
    m1 = mentions_stage(extract_text_stage(fixture_pages))
    ids_a = sorted(r["mention_id"] for r in m1.collect())
    # Recompute under different parallelism — IDs must not change.
    ids_b = sorted(
        r["mention_id"]
        for r in mentions_stage(
            extract_text_stage(fixture_pages.repartition(7))
        ).collect()
    )
    assert ids_a == ids_b
    assert len(ids_a) == len(set(ids_a))  # span-keyed => unique


def test_extract_stage_is_shuffle_free(spark, fixture_pages):
    plan = triples_stage(
        extract_text_stage(fixture_pages)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle in the extraction stage
