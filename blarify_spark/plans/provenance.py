"""Crawl-provenance layer: WHICH ingest event changed WHAT (round-4).

Blarify's integration layer attributes graph changes to the commits/PRs
that caused them: commit nodes, `MODIFIED_BY` edges from code nodes to
commits with exact blame line ranges JSON-encoded into edge attributes
(reference: blarify/graph/relationship/relationship_creator.py:241-378,
blame attrs :341-363), commit→workflow `AFFECTS` edges (:380-404), and
PR→commit `INTEGRATION_SEQUENCE` edges (:205-238).

Web-KG restatement — the "commit" is a CRAWL EVENT (one ingest/refresh
session over the corpus), and attribution comes from the snapshot diff
instead of git blame:

* crawl_event_node      — one deterministic CRAWL node per ingest
                          session (CommitNode analog) carrying the
                          session's change counts.
* modified_by_edges     — page-version → crawl edges for every page the
                          session touched, with span-level attribution
                          (the sentence spans this crawl's content
                          contributes, i.e. our blame line-ranges) as a
                          JSON attrs column, mirroring
                          create_modified_by_with_blame's json.dumps of
                          blamed_lines (relationship_creator.py:341-349).
* affects_edges         — crawl → entity edges for every canonical
                          entity whose mentions changed in the session
                          (the commit→AFFECTS analog, :380-404).
* integration_sequence_edges — session-history chain: a batch node →
                          each crawl event with an `order` attribute
                          (:217-238).

Everything is pure DataFrame plan: one semi-join of the triple table
against the changed-url set, one groupBy(url) span collection, one
endpoint dedup — no UDFs, no driver loops. At 10^12 documents the only
shuffle is the per-url span aggregation, keyed by url (uniform), and
the edge tables are O(changed pages + affected entities), never
O(corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PROV_NODE_COLS = ["node_id", "kind", "name", "event_ts", "attrs"]
PROV_EDGE_COLS = ["src_id", "dst_id", "edge_type", "url", "attrs"]


def crawl_node_id(crawl_id: str) -> F.Column:
    """Deterministic CRAWL node key (blarify hashed_id analog,
    id_calculator.py:10-12)."""
    return F.md5(F.concat(F.lit("crawl:"), F.lit(crawl_id)))


def crawl_event_node(
    changes: DataFrame, crawl_id: str, event_ts: str | None = None
) -> DataFrame:
    """One CRAWL node per ingest session with its change counts in the
    attrs JSON (the CommitNode analog — external_id/timestamp/message
    become crawl_id/event_ts/summary). event_ts is caller-supplied (the
    ingest wall time or the snapshot's max warc_ts) and None by default
    so the node stays DETERMINISTIC in its inputs — re-running the
    attribution must emit byte-identical rows (idempotent merge)."""
    counts = changes.groupBy().agg(
        *[
            F.sum(F.when(F.col("change") == c, 1).otherwise(0)).alias(
                c.lower()
            )
            for c in ["ADDED", "MODIFIED", "DELETED", "MOVED", "UNCHANGED"]
        ]
    )
    return counts.select(
        crawl_node_id(crawl_id).alias("node_id"),
        F.lit("CRAWL").alias("kind"),
        F.lit(crawl_id).alias("name"),
        F.lit(event_ts).cast("string").alias("event_ts"),
        F.to_json(
            F.struct("added", "modified", "deleted", "moved", "unchanged")
        ).alias("attrs"),
    )


def page_version_id(url_col, hash_col) -> F.Column:  # noqa: ANN001
    """Deterministic page-version node key: a page's identity AT a
    content version — (url, content digest)."""
    return F.md5(F.concat(F.lit("page:"), url_col, F.lit("@"), hash_col))


def modified_by_edges(
    changes: DataFrame, new_triples: DataFrame, crawl_id: str
) -> DataFrame:
    """Page-version → CRAWL `MODIFIED_BY` edges for every page this
    session touched, with span-level attribution.

    attrs JSON mirrors create_modified_by_with_blame
    (relationship_creator.py:341-363): `spans` = the sentence spans whose
    triples this crawl's content now contributes on the page (our blame
    line ranges), `total_spans` the count, plus change context. DELETED
    pages get a tombstone edge with empty spans — the crawl that removed
    a page is part of its provenance too.
    """
    touched = changes.filter(F.col("change") != "UNCHANGED").select(
        "url", "change", "old_url", "new_hash"
    )
    spans = (
        new_triples.join(touched.select("url"), "url", "left_semi")
        .select("url", "span_start", "span_end")
        .groupBy("url")
        .agg(
            F.array_sort(
                F.collect_set(F.struct("span_start", "span_end"))
            ).alias("span_list")
        )
    )
    j = touched.join(spans, "url", "left")
    span_list = F.coalesce(
        F.col("span_list"),
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )
    attrs = F.to_json(
        F.struct(
            F.col("change").alias("change_type"),
            F.transform(
                span_list,
                lambda s: F.struct(
                    s["span_start"].alias("start"), s["span_end"].alias("end")
                ),
            ).alias("spans"),
            F.size(span_list).alias("total_spans"),
            F.col("old_url"),
            F.lit("snapshot-diff").alias("attribution_method"),
            F.lit("exact").alias("attribution_accuracy"),
        )
    )
    return j.select(
        page_version_id(
            F.col("url"), F.coalesce("new_hash", F.lit("deleted"))
        ).alias("src_id"),
        crawl_node_id(crawl_id).alias("dst_id"),
        F.lit("MODIFIED_BY").alias("edge_type"),
        "url",
        attrs.alias("attrs"),
    )


def affects_edges(
    changes: DataFrame, new_triples: DataFrame, crawl_id: str
) -> DataFrame:
    """CRAWL → entity `AFFECTS` edges (relationship_creator.py:380-404
    analog): one edge per resolved entity mentioned on a page this
    session touched — the entity-level fan-out of the change."""
    changed_urls = changes.filter(F.col("change") != "UNCHANGED").select(
        "url"
    )
    on_changed = new_triples.join(changed_urls, "url", "left_semi")
    ents = (
        on_changed.select(F.col("subj_id").alias("ent"))
        .unionAll(on_changed.select(F.col("obj_id").alias("ent")))
        .distinct()
    )
    return ents.select(
        crawl_node_id(crawl_id).alias("src_id"),
        F.col("ent").alias("dst_id"),
        F.lit("AFFECTS").alias("edge_type"),
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("string").alias("attrs"),
    )


def integration_sequence_edges(
    spark, batch_id: str, crawl_ids: list[str]
) -> DataFrame:
    """Batch → crawl `INTEGRATION_SEQUENCE` edges with an order attr —
    the PR→commit ordering chain (relationship_creator.py:217-238): an
    ingest BATCH groups the crawl sessions applied in sequence."""
    rows = [(batch_id, cid, i) for i, cid in enumerate(crawl_ids)]
    df = spark.createDataFrame(rows, "batch string, crawl string, ord int")
    return df.select(
        F.md5(F.concat(F.lit("batch:"), F.col("batch"))).alias("src_id"),
        F.md5(F.concat(F.lit("crawl:"), F.col("crawl"))).alias("dst_id"),
        F.lit("INTEGRATION_SEQUENCE").alias("edge_type"),
        F.lit(None).cast("string").alias("url"),
        F.to_json(F.struct(F.col("ord").alias("order"))).alias("attrs"),
    )


def provenance_tables(
    changes: DataFrame,
    new_triples: DataFrame,
    crawl_id: str,
    event_ts: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(prov_nodes, prov_edges) for one ingest session — the full
    MODIFIED_BY + AFFECTS attribution of a snapshot diff. Deterministic
    in (changes, new_triples, crawl_id): re-running emits identical rows
    (idempotent upsert into a graph sink, apoc.merge semantics)."""
    nodes = crawl_event_node(changes, crawl_id, event_ts).select(
        *PROV_NODE_COLS
    )
    edges = (
        modified_by_edges(changes, new_triples, crawl_id)
        .unionByName(affects_edges(changes, new_triples, crawl_id))
        .select(*PROV_EDGE_COLS)
    )
    return nodes, edges
