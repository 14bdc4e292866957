"""Degenerate-input guards: empty corpora, all-garbage corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from blarify_spark.plans.canonicalize import canonicalize
from blarify_spark.plans.extract import (
    extract_all_stage,
    mentions_from,
    triples_from,
)
from blarify_spark.plans.linking import resolve_triples
from blarify_spark.sources.alias import alias_dict
from blarify_spark.sources.pages import PAGES_SCHEMA


def test_empty_corpus_flows_through_all_stages(spark):
    empty = spark.createDataFrame([], schema=PAGES_SCHEMA)
    ext = extract_all_stage(empty)
    assert ext.count() == 0
    triples = resolve_triples(
        triples_from(ext), mentions_from(ext), alias_dict(spark)
    )
    assert triples.count() == 0
    nodes, edges, mapping = canonicalize(triples)
    assert nodes.count() == 0
    assert edges.count() == 0


def test_all_garbage_corpus_yields_no_triples_but_keeps_rows(spark):
    rows = [
        (f"https://x.test/g{i}", None, b"\xff\xfe bad utf8", None, "en", "raw")
        for i in range(5)
    ]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    ext = extract_all_stage(pages)
    assert ext.count() == 5
    assert ext.filter(F.col("extract_status") == "raw").count() == 5
    assert triples_from(ext).count() == 0
    assert mentions_from(ext).count() == 0


def test_pagerank_releases_caches_and_is_deterministic(spark, monkeypatch):
    """kg_pagerank cache hygiene (VERDICT r03 #9): both per-query caches
    are unpersisted before the query returns (finally path verified via
    an unpersist spy), and the returned top-10 — which must survive the
    unpersist thanks to the final eager lineage cut — is identical
    across invocations."""
    from blarify_spark.operators.kg_queries import kg_pagerank

    # patch the CONCRETE DataFrame class (Spark 4's classic subclass
    # overrides unpersist, so patching the abstract base intercepts
    # nothing)
    cls = type(spark.range(1))
    released = []
    orig = cls.unpersist

    def spy(self, blocking=False):
        released.append(self)
        return orig(self, blocking)

    monkeypatch.setattr(cls, "unpersist", spy)
    a = [tuple(r) for r in kg_pagerank(spark, "/root/testdata/sf0.001").collect()]
    assert len(released) >= 2  # edges + nodes caches freed
    assert len(a) == 10 and a == sorted(a, key=lambda r: (-r[1], r[0]))
    b = [tuple(r) for r in kg_pagerank(spark, "/root/testdata/sf0.001").collect()]
    assert a == b
