"""Empty-container GC to fixpoint (SURVEY.md Q18).

Blarify repeatedly matches FOLDER nodes with no outgoing CONTAINS edge and
detach-deletes them until none remain — deleting a folder can empty its
parent, hence the loop (reference:
blarify/prebuilt/graph_builder.py:247-259
_detatch_empty_folder_nodes_iteratively).

Spark restatement: each round is one anti-join (containers minus edge
sources) finding the empty set, one anti-join shrinking the node table,
and one anti-join dropping edges INTO deleted nodes (detach). Rounds are
bounded by hierarchy depth; each round's frontier is localCheckpoint'ed to
cut lineage, exactly like the canonicalization loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from blarify_spark.functions.checkpoint import cut_lazy, cut_lineage

MAX_ROUNDS = 20


def gc_empty_containers(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = MAX_ROUNDS
) -> tuple[DataFrame, DataFrame]:
    """Iteratively delete container nodes with no outgoing edges.

    nodes: (node_id, kind, ...) with kind in ('container', 'leaf') —
    only containers are GC candidates (blarify deletes FOLDERs only).
    edges: (src, dst).

    Returns (alive_nodes, deleted) where deleted = (node_id, round).
    """
    alive = nodes.transform(cut_lineage)
    e = edges.select("src", "dst").transform(cut_lineage)
    deleted = nodes.select("node_id").filter(F.lit(False)).withColumn(
        "round", F.lit(0)
    )
    for rnd in range(1, max_rounds + 1):
        empty = (
            alive.filter(F.col("kind") == "container")
            .join(
                e.select(F.col("src").alias("node_id")).distinct(),
                "node_id",
                "left_anti",
            )
            .select("node_id")
            .transform(cut_lineage)
        )
        if empty.isEmpty():
            break
        # deferred cuts (r6): both frames' only consumer is the next
        # round's eager `empty` checkpoint, which covers every partition
        # — the two standalone checkpoint jobs per round fuse into it
        # (3 -> 1 driver actions per round)
        alive = alive.join(empty, "node_id", "left_anti").transform(cut_lazy)
        # detach: a deleted container has no outgoing edges by definition,
        # so only edges INTO it need dropping
        e = e.join(
            empty.withColumnRenamed("node_id", "dst"), "dst", "left_anti"
        ).transform(cut_lazy)
        deleted = deleted.unionByName(empty.withColumn("round", F.lit(rnd)))
    else:
        # loop exhausted max_rounds with a non-empty frontier still
        # possible — a deeper-than-budget hierarchy would silently leave
        # empty containers alive (ADVICE r02): fail loudly
        leftover = (
            alive.filter(F.col("kind") == "container")
            .join(
                e.select(F.col("src").alias("node_id")).distinct(),
                "node_id",
                "left_anti",
            )
            .count()
        )
        if leftover:
            raise RuntimeError(
                f"gc_empty_containers: {leftover} empty containers remain "
                f"after {max_rounds} rounds — raise max_rounds"
            )
    return alive, deleted


def url_hierarchy(pages: DataFrame, triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Build a CONTAINS hierarchy from urls: host -> family-prefix -> page
    -> mentioned entities (leaves). The web analog of blarify's
    folder/file/definition tree; pages that extracted nothing (RAW
    garbage) become empty containers the GC must collect, cascading into
    their family/host when those empty out.

    Returns (nodes(node_id, kind, name), edges(src, dst)).
    """
    host = F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1)
    prefix = F.regexp_extract("url", r"^([a-z]+://[^/]+/[^/]+)", 1)
    p = pages.select("url", host.alias("host"), prefix.alias("prefix"))

    page_nodes = p.select(
        F.col("url").alias("node_id"), F.lit("container").alias("kind"),
        F.col("url").alias("name"),
    )
    prefix_nodes = p.select(
        F.col("prefix").alias("node_id"), F.lit("container").alias("kind"),
        F.col("prefix").alias("name"),
    ).distinct()
    host_nodes = p.select(
        F.col("host").alias("node_id"), F.lit("container").alias("kind"),
        F.col("host").alias("name"),
    ).distinct()
    ent = (
        triples.select("url", F.col("subj_id").alias("eid"))
        .unionAll(triples.select("url", F.col("obj_id").alias("eid")))
        .distinct()
    )
    ent_nodes = ent.select(
        F.col("eid").alias("node_id"), F.lit("leaf").alias("kind"),
        F.col("eid").alias("name"),
    ).distinct()

    nodes = (
        host_nodes.unionByName(prefix_nodes)
        .unionByName(page_nodes)
        .unionByName(ent_nodes)
        .dropDuplicates(["node_id"])
    )
    edges = (
        p.select(F.col("host").alias("src"), F.col("prefix").alias("dst"))
        .unionAll(p.select(F.col("prefix").alias("src"), F.col("url").alias("dst")))
        .unionAll(ent.select(F.col("url").alias("src"), F.col("eid").alias("dst")))
        .distinct()
    )
    return nodes, edges
