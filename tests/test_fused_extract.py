"""Fused single-crossing extraction must equal the split-stage path."""

from __future__ import annotations

from pyspark.sql import functions as F

from blarify_spark.plans.extract import (
    extract_all_stage,
    extract_text_stage,
    mentions_from,
    mentions_stage,
    triples_from,
    triples_stage,
)
from blarify_spark.plans.linking import link_mentions, link_triples
from blarify_spark.sources.alias import alias_dict


def test_fused_text_and_status_match_split(spark, fixture_pages):
    fused = extract_all_stage(fixture_pages).select(
        "url", "text", "extract_status"
    )
    split = extract_text_stage(fixture_pages).select(
        "url", "text", "extract_status"
    )
    assert sorted(map(tuple, fused.collect())) == sorted(
        map(tuple, split.collect())
    )


def test_fused_triples_match_split(spark, fixture_pages):
    fused = triples_from(extract_all_stage(fixture_pages))
    split = triples_stage(extract_text_stage(fixture_pages))
    cols = ["url", "subj", "pred", "obj", "span_start", "span_end"]
    assert sorted(map(tuple, fused.select(*cols).collect())) == sorted(
        map(tuple, split.select(*cols).collect())
    )


def test_fused_mentions_match_split(spark, fixture_pages):
    fused = mentions_from(extract_all_stage(fixture_pages))
    split = mentions_stage(extract_text_stage(fixture_pages))
    cols = ["url", "mention_id", "surface", "span_start", "span_end"]
    assert sorted(map(tuple, fused.select(*cols).collect())) == sorted(
        map(tuple, split.select(*cols).collect())
    )


def test_fused_linking_identical_and_jvm_only(spark, fixture_pages):
    fused_ex = extract_all_stage(fixture_pages)
    lm_fused = link_mentions(mentions_from(fused_ex), alias_dict(spark))
    lm_split = link_mentions(
        mentions_stage(extract_text_stage(fixture_pages)), alias_dict(spark)
    )
    cols = ["mention_id", "entity_id", "canonical_name", "linked"]
    assert sorted(map(tuple, lm_fused.select(*cols).collect())) == sorted(
        map(tuple, lm_split.select(*cols).collect())
    )
    # each single branch of the fused path crosses Python exactly once;
    # with the stage persisted (as run_pipeline/bench do) the whole
    # resolved-triple plan reads the cache instead of re-running the UDF
    single = triples_from(fused_ex)
    assert (
        single._jdf.queryExecution().executedPlan().toString().count(
            "ArrowEvalPython"
        )
        == 1
    )
    cached = fused_ex.persist()
    cached.count()
    lt = link_triples(
        triples_from(cached),
        link_mentions(mentions_from(cached), alias_dict(spark)),
    )
    plan = lt._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    cached.unpersist()


def test_fused_link_scores_match(spark, fixture_pages):
    """Token/embedding computed in-Python (fused) vs natively (split) must
    produce identical link scores."""
    lm_fused = link_mentions(
        mentions_from(extract_all_stage(fixture_pages)), alias_dict(spark)
    )
    lm_split = link_mentions(
        mentions_stage(extract_text_stage(fixture_pages)), alias_dict(spark)
    )
    a = {r["mention_id"]: r["link_score"] for r in lm_fused.collect()}
    b = {r["mention_id"]: r["link_score"] for r in lm_split.collect()}
    assert a == b
