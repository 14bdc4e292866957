"""Incremental update — snapshot diff + selective recompute (§3.2 analog).

Blarify's incremental path deletes stale nodes by path, rebuilds only
changed files, and classifies ADDED/MODIFIED/DELETED by joining current
vs previous on relative_id with text-equivalence checks
(reference: blarify/prebuilt/graph_builder.py:178-235,
blarify/project_graph_diff_creator.py:131-179, updater
blarify/project_graph_updater.py:61-69).

Spark restatement: one full-outer join of the two snapshots on url with
content-hash comparison classifies every page; extraction is recomputed
only for added|modified urls; the final triple table is
(previous minus affected urls) union (recomputed) — deterministic keys
make the merge idempotent, mirroring apoc.merge upserts
(neo4j_manager.py:128-142).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from blarify_spark.plans.extract import extract_text_stage, triples_stage


def classify_pages(old_pages: DataFrame, new_pages: DataFrame) -> DataFrame:
    """Full-outer join on url -> (url, change) with change in
    ADDED | DELETED | MODIFIED | UNCHANGED.

    Content identity is md5(html) — cheap, no extraction needed (the D3/D4
    analog: relative-id match + content-equivalence test).
    """
    o = old_pages.select(
        F.col("url"), F.md5(F.col("html").cast("binary")).alias("old_hash")
    )
    n = new_pages.select(
        F.col("url"), F.md5(F.col("html").cast("binary")).alias("new_hash")
    )
    joined = o.join(n, "url", "full_outer")
    return joined.select(
        "url",
        F.when(F.col("old_hash").isNull(), F.lit("ADDED"))
        .when(F.col("new_hash").isNull(), F.lit("DELETED"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("MODIFIED"))
        .otherwise(F.lit("UNCHANGED"))
        .alias("change"),
    )


def incremental_triples(
    old_pages: DataFrame,
    new_pages: DataFrame,
    old_triples: DataFrame,
) -> DataFrame:
    """Recompute extraction only for changed pages; merge with previous.

    Returns the new triples table:
      previous triples for UNCHANGED urls
      + freshly extracted triples for ADDED|MODIFIED urls
      (DELETED urls drop out — the detach-delete analog,
      neo4j_manager.py:210-224).
    """
    changes = classify_pages(old_pages, new_pages)
    affected = changes.filter(
        F.col("change").isin("ADDED", "MODIFIED")
    ).select("url")
    stale_or_gone = changes.filter(
        F.col("change").isin("MODIFIED", "DELETED")
    ).select("url")

    keep = old_triples.join(stale_or_gone, "url", "left_anti")
    recompute_pages = new_pages.join(affected, "url", "left_semi")
    fresh = triples_stage(extract_text_stage(recompute_pages))
    return keep.unionByName(fresh, allowMissingColumns=True)
