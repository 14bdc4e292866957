"""Entity-linking stage tests: broadcast join + scoring + disambiguation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from blarify_spark.corpus import entity_id
from blarify_spark.plans.extract import (
    extract_text_stage,
    mentions_stage,
    triples_stage,
)
from blarify_spark.plans.linking import link_mentions, link_triples
from blarify_spark.sources.alias import alias_dict


@pytest.fixture(scope="module")
def linked(spark, fixture_pages):
    pages = extract_text_stage(fixture_pages).cache()
    mentions = mentions_stage(pages)
    lm = link_mentions(mentions, alias_dict(spark)).cache()
    lm.count()
    return lm


def test_every_mention_gets_exactly_one_row(spark, fixture_pages, linked):
    mentions = mentions_stage(extract_text_stage(fixture_pages))
    assert linked.count() == mentions.count()
    assert linked.select("mention_id").distinct().count() == linked.count()


def test_unambiguous_aliases_link_correctly(linked):
    rows = linked.filter(F.col("surface") == "Ada Lovelace").collect()
    assert rows
    for r in rows:
        assert r["linked"]
        assert r["entity_id"] == entity_id("Ada Lovelace")
        assert r["canonical_name"] == "Ada Lovelace"


def test_alias_spelling_resolves_to_same_entity(linked):
    acme = entity_id("Acme Corporation")
    for surf in ["Acme Corporation", "Acme Corp"]:
        rows = linked.filter(F.col("surface") == surf).collect()
        assert rows, surf
        assert all(r["entity_id"] == acme for r in rows), surf


def test_ambiguous_mercury_disambiguated_by_context(linked):
    rows = linked.filter(F.col("surface") == "Mercury").collect()
    got = {r["canonical_name"] for r in rows if r["linked"]}
    # Both senses must appear: planet pages ctx contains 'planet',
    # element pages ctx contains 'chemical element'.
    assert "Mercury (planet)" in got
    assert "Mercury (element)" in got


def test_unlinked_surfaces_get_deterministic_nil(linked):
    nil_rows = linked.filter(~F.col("linked")).collect()
    assert nil_rows  # e.g. "Pied Piper", "Wile Coyote" not in dictionary
    seen = {}
    for r in nil_rows:
        key = r["surface"].lower()
        seen.setdefault(key, set()).add(r["entity_id"])
    for key, ids in seen.items():
        assert len(ids) == 1, key  # same surface -> same NIL id everywhere


def test_linking_plan_uses_broadcast_join(spark, fixture_pages):
    mentions = mentions_stage(extract_text_stage(fixture_pages))
    lm = link_mentions(mentions, alias_dict(spark))
    plan = lm._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_link_triples_resolves_endpoints(spark, fixture_pages, linked):
    pages = extract_text_stage(fixture_pages)
    triples = triples_stage(pages)
    lt = link_triples(triples, linked).cache()
    assert lt.count() > 0
    hooli = lt.filter(
        (F.col("subj") == "Hooli") & (F.col("pred") == "acquired")
    ).collect()
    assert hooli
    for r in hooli:
        assert r["subj_id"] == entity_id("Hooli")
        assert r["obj_name"] == "Pied Piper"  # NIL entity keeps surface
    # no self-loops
    assert lt.filter(F.col("subj_id") == F.col("obj_id")).count() == 0
