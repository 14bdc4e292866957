"""Crawl-provenance layer tests (round-4): MODIFIED_BY span attribution,
AFFECTS fan-out, INTEGRATION_SEQUENCE ordering, idempotency, and the
materialized prov stages — blarify integration-layer parity
(relationship_creator.py:217-404)."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F

from blarify_spark.plans.diff import classify_pages
from blarify_spark.plans.extract import (
    extract_all_stage,
    mentions_from,
    triples_from,
)
from blarify_spark.plans.linking import link_mentions, link_triples
from blarify_spark.plans.provenance import (
    affects_edges,
    crawl_event_node,
    integration_sequence_edges,
    modified_by_edges,
    provenance_tables,
)
from blarify_spark.sources.alias import alias_dict
from blarify_spark.sources.pages import pages_from_rows

T0 = datetime.datetime(2025, 1, 1)


def _page(url, sentences):
    html = (
        "<html><body>"
        + "".join(f"<p>{s}</p>" for s in sentences)
        + "</body></html>"
    ).encode()
    return {
        "url": url,
        "warc_ts": T0,
        "html": html,
        "text": None,
        "lang": "en",
        "family": "prov",
    }


SNAP1 = [
    _page("https://p.test/keep", ["Initech works at Gotham."]),
    _page("https://p.test/mod", ["Globex acquired Hooli."]),
    _page("https://p.test/gone", ["Acme Corporation acquired Initech."]),
]
SNAP2 = [
    SNAP1[0],
    _page(
        "https://p.test/mod",
        ["Globex acquired Hooli.", "Globex is located in Springfield."],
    ),
    _page("https://p.test/new", ["Marie Curie discovered radium."]),
]


def _linked(spark, rows):
    pages = extract_all_stage(pages_from_rows(spark, rows)).cache()
    lk = link_mentions(mentions_from(pages), alias_dict(spark))
    return link_triples(triples_from(pages), lk).cache()


def _fixture(spark):
    changes = classify_pages(
        pages_from_rows(spark, SNAP1), pages_from_rows(spark, SNAP2)
    ).cache()
    new_t = _linked(spark, SNAP2)
    return changes, new_t


def test_modified_by_edges_only_for_changed_urls(spark):
    changes, new_t = _fixture(spark)
    mb = modified_by_edges(changes, new_t, "c1").cache()
    got_urls = {r["url"] for r in mb.select("url").collect()}
    want = {
        r["url"]
        for r in changes.filter(F.col("change") != "UNCHANGED").collect()
    }
    assert got_urls == want
    assert "https://p.test/keep" not in got_urls
    # all edges point at the same deterministic crawl node
    assert mb.select("dst_id").distinct().count() == 1
    assert {r["edge_type"] for r in mb.collect()} == {"MODIFIED_BY"}


def test_span_attribution_matches_triples(spark):
    """The blame-analog: attrs.spans of a modified page == the sorted
    triple spans of that page in the new snapshot
    (create_modified_by_with_blame's blamed_lines json,
    relationship_creator.py:341-349)."""
    changes, new_t = _fixture(spark)
    mb = modified_by_edges(changes, new_t, "c1")
    row = mb.filter(F.col("url") == "https://p.test/mod").collect()[0]
    attrs = json.loads(row["attrs"])
    want = sorted(
        (r["span_start"], r["span_end"])
        for r in new_t.filter(F.col("url") == "https://p.test/mod")
        .select("span_start", "span_end")
        .distinct()
        .collect()
    )
    got = [(s["start"], s["end"]) for s in attrs["spans"]]
    assert got == want
    assert attrs["total_spans"] == len(want) >= 2
    assert attrs["change_type"] == "MODIFIED"
    assert attrs["attribution_method"] == "snapshot-diff"


def test_deleted_page_gets_tombstone_edge(spark):
    changes, new_t = _fixture(spark)
    mb = modified_by_edges(changes, new_t, "c1")
    row = mb.filter(F.col("url") == "https://p.test/gone").collect()[0]
    attrs = json.loads(row["attrs"])
    assert attrs["change_type"] == "DELETED"
    assert attrs["spans"] == [] and attrs["total_spans"] == 0


def test_affects_edges_cover_changed_url_entities_only(spark):
    changes, new_t = _fixture(spark)
    af = affects_edges(changes, new_t, "c1")
    got = {r["dst_id"] for r in af.collect()}
    changed_urls = changes.filter(F.col("change") != "UNCHANGED").select(
        "url"
    )
    on_changed = new_t.join(changed_urls, "url", "left_semi")
    want = {
        r["e"]
        for r in on_changed.select(F.col("subj_id").alias("e"))
        .unionAll(on_changed.select(F.col("obj_id").alias("e")))
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0
    # the untouched page's exclusive entity is NOT attributed
    keep_ids = {
        r["e"]
        for r in new_t.filter(F.col("url") == "https://p.test/keep")
        .select(F.col("obj_id").alias("e"))  # "Gotham" appears only there
        .collect()
    }
    assert not (keep_ids & got)


def test_provenance_idempotent_and_crawl_counts(spark):
    changes, new_t = _fixture(spark)
    n1, e1 = provenance_tables(changes, new_t, "c1")
    n2, e2 = provenance_tables(changes, new_t, "c1")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    assert rows(n1) == rows(n2)
    assert rows(e1) == rows(e2)
    attrs = json.loads(n1.collect()[0]["attrs"])
    by_change = {
        r["change"]: r["n"]
        for r in changes.groupBy("change").agg(F.count("*").alias("n")).collect()
    }
    assert attrs["modified"] == by_change.get("MODIFIED", 0)
    assert attrs["deleted"] == by_change.get("DELETED", 0)
    assert attrs["added"] == by_change.get("ADDED", 0)
    # distinct crawl ids -> distinct crawl nodes
    nx = crawl_event_node(changes, "c2")
    assert (
        nx.collect()[0]["node_id"] != n1.collect()[0]["node_id"]
    )


def test_integration_sequence_orders_crawls(spark):
    seq = integration_sequence_edges(spark, "batch1", ["c1", "c2", "c3"])
    rows = seq.collect()
    assert len(rows) == 3
    assert {r["edge_type"] for r in rows} == {"INTEGRATION_SEQUENCE"}
    orders = [json.loads(r["attrs"])["order"] for r in rows]
    assert sorted(orders) == [0, 1, 2]
    assert len({r["src_id"] for r in rows}) == 1  # one batch node


def test_chained_incremental_runs_extend_integration_sequence(
    spark, tmp_path
):
    """Two chained incremental runs accumulate one ordered crawl chain
    (v1 -> v2 -> v3 with orders 0/1/2), renderable as
    INTEGRATION_SEQUENCE edges (relationship_creator.py:217-238)."""
    from blarify_spark.plans.materialize import run_incremental, run_pipeline

    out = str(tmp_path / "kg")
    run_pipeline(spark, pages_from_rows(spark, SNAP1), out, run_id="v1")
    run_incremental(
        spark,
        pages_from_rows(spark, SNAP2),
        out,
        run_id="v2",
        prev_run_id="v1",
    )
    snap3 = SNAP2 + [_page("https://p.test/extra", ["Hooli acquired Initech."])]
    inc3 = run_incremental(
        spark,
        pages_from_rows(spark, snap3),
        out,
        run_id="v3",
        prev_run_id="v2",
    )
    chain = sorted(
        (r["ord"], r["crawl_id"]) for r in inc3["crawl_chain"].collect()
    )
    assert chain == [(0, "v1"), (1, "v2"), (2, "v3")]
    ids = [c for _, c in chain]
    edges = integration_sequence_edges(
        spark, inc3["crawl_chain"].collect()[0]["batch_id"], ids
    ).collect()
    assert len(edges) == 3
    assert len({e["src_id"] for e in edges}) == 1


def test_run_incremental_materializes_provenance(spark, tmp_path):
    from blarify_spark.plans.materialize import (
        run_incremental,
        run_pipeline,
        stage_committed,
    )

    out = str(tmp_path / "kg")
    run_pipeline(spark, pages_from_rows(spark, SNAP1), out, run_id="v1")
    inc = run_incremental(
        spark,
        pages_from_rows(spark, SNAP2),
        out,
        run_id="v2",
        prev_run_id="v1",
    )
    for stage in ["prov_nodes", "prov_edges"]:
        assert stage_committed(out, "v2", stage), stage
    assert inc["prov_nodes"].count() == 1
    pe = inc["prov_edges"]
    assert pe.filter(F.col("edge_type") == "MODIFIED_BY").count() >= 3
    assert pe.filter(F.col("edge_type") == "AFFECTS").count() >= 1
    # crawl_id == run_id: the consumer joins edges -> node by crawl
    node_id = inc["prov_nodes"].collect()[0]["node_id"]
    assert (
        pe.filter(F.col("edge_type") == "MODIFIED_BY")
        .select("dst_id")
        .distinct()
        .collect()[0]["dst_id"]
        == node_id
    )
