"""Stage 2 — entity linking: mentions -> (entity_id, score) via broadcast join.

Spark restatement of blarify's reference resolution (the join stage,
SURVEY.md §2.3):

* L1/L2 symbol lookup + inverted-index probe
  (reference: blarify/code_references/scip_helper.py:716-804,875-923)
  -> one broadcast hash equi-join on the normalized surface form.
* L3 candidate scoring / disambiguation
  (reference: blarify/code_references/hybrid_resolver.py:145-185)
  -> native column scoring (prior + context-token overlap + embedding
  cosine) and a window top-1 per mention.

Scale notes: the alias dictionary broadcasts (F.broadcast); scoring is
pure codegen (no Python when mentions arrive from the fused extractor);
the only shuffle is the top-1 min_by aggregation keyed by mention_id —
an md5, so uniformly distributed: a head surface form appearing in half
the corpus creates no hot key (skew-immune by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from blarify_spark.functions.checkpoint import cut_lineage
from blarify_spark.functions.udfs import ctx_embedding_udf
from blarify_spark.corpus import EMB_DIM
from blarify_spark.functions.vector import cosine_fixed

# Score weights (tunable; P/R slack lives here, SURVEY.md §7 hard-parts).
W_PRIOR = 0.2
W_TOKENS = 0.5
W_EMBED = 0.3
MIN_SCORE = 0.05


def _tokenize_ctx(col: F.Column) -> F.Column:
    """Lower-cased word tokens of the context sentence (native split)."""
    return F.filter(
        F.split(F.lower(F.regexp_replace(col, r"[^A-Za-z0-9\s]", " ")), r"\s+"),
        lambda t: F.length(t) > 0,
    )


def link_mentions(mentions: DataFrame, alias_df: DataFrame) -> DataFrame:
    """mentions x alias_dict -> linked mentions with top-1 entity.

    Output: url, mention_id, surface, sentence_idx, span_start, span_end,
    entity_id, canonical_name, link_score, linked (bool). Unlinked
    mentions (no dictionary candidate above MIN_SCORE) keep a
    deterministic NIL entity keyed by their normalized surface — the
    analog of blarify keeping unresolved references as plain USES edges
    rather than dropping them (tree_sitter_helper.py:50-63 default case).
    """
    cand = _score_candidates(mentions, alias_df)

    # Top-1 per mention via min_by hash aggregation instead of a
    # row_number window: the window needs a full sort-shuffle of every
    # candidate row; min_by gets map-side partial aggregation (candidates
    # of one mention are co-located in the scan partition, so they
    # collapse BEFORE the shuffle) and ships only the narrow projected
    # payload — ~2x faster at 1.5M mentions, and skew-free (mention_id is
    # an md5). A fully shuffle-free array-reduction variant was measured
    # SLOWER: Catalyst higher-order functions are interpreted, not
    # codegen'd — keep the agg. Deterministic tie-break (-score, entity_id).
    payload = F.struct(
        F.col("url"),
        F.col("surface"),
        F.col("sentence_idx"),
        F.col("span_start"),
        F.col("span_end"),
        F.col("surface_key"),
        F.col("entity_id"),
        F.col("canonical_name"),
        F.col("link_score"),
    )
    order_key = F.struct(
        (-F.coalesce(F.col("link_score"), F.lit(-1.0))).alias("neg_score"),
        F.coalesce(F.col("entity_id"), F.lit("~")).alias("eid"),
    )
    best = (
        cand.groupBy("mention_id")
        .agg(F.min_by(payload, order_key).alias("b"))
        .select("mention_id", "b.*")
    )

    nil_id = F.md5(F.concat(F.lit("nil:"), F.col("surface_key")))
    linked = F.col("entity_id").isNotNull() & (F.col("link_score") >= MIN_SCORE)
    return best.select(
        "url",
        "mention_id",
        "surface",
        "sentence_idx",
        "span_start",
        "span_end",
        linked.alias("linked"),
        F.when(linked, F.col("entity_id")).otherwise(nil_id).alias("entity_id"),
        F.when(linked, F.col("canonical_name"))
        .otherwise(F.col("surface"))
        .alias("canonical_name"),
        F.coalesce("link_score", F.lit(0.0)).alias("link_score"),
    )


def _score_candidates(mentions: DataFrame, alias_df: DataFrame) -> DataFrame:
    """Shared scoring plan: broadcast candidate join + codegen score."""
    m = mentions.withColumn("surface_key", F.lower(F.col("surface")))
    if "m_tokens" not in mentions.columns:
        m = m.withColumn("m_tokens", _tokenize_ctx(F.col("ctx")))
    if "m_embedding" not in mentions.columns:
        m = m.withColumn("m_embedding", ctx_embedding_udf(F.col("m_tokens")))
    cand = m.join(
        F.broadcast(alias_df), m.surface_key == alias_df["alias"], "left"
    )
    overlap = F.size(F.array_intersect(F.col("m_tokens"), F.col("ctx_tokens")))
    denom = F.greatest(F.size(F.col("ctx_tokens")), F.lit(1))
    score = (
        F.lit(W_PRIOR) * F.coalesce(F.col("prior"), F.lit(0.0))
        + F.lit(W_TOKENS) * (overlap / denom)
        + F.lit(W_EMBED)
        * F.greatest(
            cosine_fixed("m_embedding", "ctx_embedding", EMB_DIM), F.lit(0.0)
        )
    )
    return cand.withColumn(
        "link_score",
        F.when(F.col("entity_id").isNotNull(), F.round(score, 6)).otherwise(
            F.lit(None).cast("double")
        ),
    )


def page_entity_links(mentions: DataFrame, alias_df: DataFrame) -> DataFrame:
    """Best entity per (url, surface) in ONE aggregation.

    The hot-path form used by resolve_triples: instead of per-mention
    top-1 (shuffle 1) followed by per-page groupBy (shuffle 2), aggregate
    straight to the page level — same deterministic result (min over all
    candidate rows by (-score, entity_id)), half the shuffle volume.

    One exchange serves the whole link chain (guide §2.4): mentions are
    hash-partitioned by url up front, which satisfies the clustering
    requirement of BOTH this groupBy(url, surface) and the downstream
    per-url map aggregation in link_triples — neither inserts its own
    Exchange, and the url-keyed partitioning is what the triple join
    needs anyway.
    """
    cand = _score_candidates(mentions.repartition("url"), alias_df)
    payload = F.struct(
        F.col("surface_key"),
        F.col("entity_id"),
        F.col("canonical_name"),
        F.col("link_score"),
    )
    order_key = F.struct(
        (-F.coalesce(F.col("link_score"), F.lit(-1.0))).alias("neg_score"),
        F.coalesce(F.col("entity_id"), F.lit("~")).alias("eid"),
    )
    best = (
        cand.groupBy("url", "surface")
        .agg(F.min_by(payload, order_key).alias("b"))
        .select("url", "surface", "b.*")
    )
    nil_id = F.md5(F.concat(F.lit("nil:"), F.col("surface_key")))
    linked = F.col("entity_id").isNotNull() & (F.col("link_score") >= MIN_SCORE)
    return best.select(
        "url",
        "surface",
        F.when(linked, F.col("entity_id")).otherwise(nil_id).alias("entity_id"),
        F.when(linked, F.col("canonical_name"))
        .otherwise(F.col("surface"))
        .alias("canonical_name"),
        F.coalesce("link_score", F.lit(0.0)).alias("link_score"),
    )


# L5 rule table: context keyword -> relationship type, priority-ordered.
# Blarify walks the reference site's AST ancestors and maps the node type
# to a RelationshipType with default USES (tree_sitter_helper.py:50-63,
# rule map python_definitions.py:61-76); the web analog classifies a
# page->entity mention edge from its sentence-context tokens via a
# BROADCAST rule-table join, default MENTIONS.
EDGE_RULES: list[tuple[int, str, str]] = [
    (1, "born", "BORN_IN"),
    (2, "capital", "CAPITAL_OF"),
    (3, "located", "LOCATED_IN"),
    (4, "acquired", "ACQUIRED"),
    (5, "founded", "FOUNDED_BY"),
    (6, "works", "WORKS_AT"),
    (7, "invented", "INVENTED"),
    (8, "discovered", "DISCOVERED"),
]
DEFAULT_EDGE_TYPE = "MENTIONS"


def classify_mention_edges(
    mentions: DataFrame, linked_mentions: DataFrame
) -> DataFrame:
    """Typed page->entity mention edges (L5).

    mentions must carry m_tokens (context tokens); linked_mentions maps
    mention_id -> entity. The rule join is a broadcast nested-loop over a
    handful of rules (array_contains predicate) — constant per-row cost;
    ties resolve by rule priority, no match falls back to MENTIONS.
    """
    spark = mentions.sparkSession
    rules = F.broadcast(
        spark.createDataFrame(
            EDGE_RULES, "priority int, keyword string, rel_type string"
        )
    )
    cand = mentions.select("mention_id", "m_tokens").join(
        rules, F.array_contains(F.col("m_tokens"), F.col("keyword")), "left"
    )
    best = cand.groupBy("mention_id").agg(
        F.min_by("rel_type", F.coalesce("priority", F.lit(999))).alias(
            "_rel"
        )
    )
    return (
        linked_mentions.join(best, "mention_id", "left")
        .select(
            F.col("url").alias("src_url"),
            F.col("entity_id").alias("dst_entity"),
            F.col("canonical_name").alias("dst_name"),
            F.coalesce("_rel", F.lit(DEFAULT_EDGE_TYPE)).alias("rel_type"),
            "span_start",
        )
    )


def resolve_triples(
    triples: DataFrame, mentions: DataFrame, alias_df: DataFrame
) -> DataFrame:
    """triples + mentions + dictionary -> entity-resolved triples, using
    the single-aggregation page_entity_links path (the production plan)."""
    return link_triples(triples, None, _page_links=page_entity_links(mentions, alias_df))


def link_triples(triples: DataFrame, linked_mentions: DataFrame, _page_links: DataFrame | None = None) -> DataFrame:
    """Resolve triple subj/obj surfaces to entity ids via the per-page
    linked mentions (join on url + surface), producing entity-level edges.

    The Spark analog of blarify's reference->edge step
    (relationship_creator.py:17-57): subjects must resolve within the same
    page context; objects fall back to a NIL entity when unlinked.
    Self-loops are dropped (relationship_creator.py:22-29 analog).
    """
    # Per (url, surface) pick the best-scored link once — avoids exploding
    # the join when a surface repeats on a page. resolve_triples passes a
    # precomputed single-aggregation page_entity_links instead.
    if _page_links is not None:
        page_links = _page_links
    else:
        # Same payload+order_key min_by pattern as page_entity_links: one
        # struct pick with an (neg_score, entity_id) tie-break, so score
        # ties resolve to ONE consistent row (independent max_by calls
        # could mix entity_id and canonical_name from different rows).
        payload = F.struct(
            F.col("entity_id"), F.col("canonical_name"), F.col("link_score")
        )
        order_key = F.struct(
            (-F.coalesce(F.col("link_score"), F.lit(-1.0))).alias("neg_score"),
            F.coalesce(F.col("entity_id"), F.lit("~")).alias("eid"),
        )
        page_links = (
            linked_mentions.groupBy("url", "surface")
            .agg(F.min_by(payload, order_key).alias("b"))
            .select("url", "surface", "b.*")
        )

    # ONE url-keyed join instead of two (url, surface) joins: fold the
    # page's links into a per-url map (tiny — distinct surfaces per page),
    # join it to the triples once, and resolve BOTH endpoints by map
    # lookup. Halves the shuffle volume over the wide triple table (the
    # dominant linking cost at scale); the extra map-build aggregation
    # shuffles only (url, surface) pairs down to one row per url.
    #
    # cut_lineage (eager): page_map is the ONLY consumer of the mention
    # branch, and materializing it first means exactly one plan branch
    # touches the (persisted) extraction per job. Without the barrier,
    # AQE launches the mention-branch and triple-branch leaf stages
    # CONCURRENTLY, and both race to materialize the extraction cache —
    # the expensive Arrow extraction UDF then runs ~twice per partition
    # (measured: two parallel 128-task ArrowEval stages in the bench
    # profile). The checkpointed table is one narrow row per url.
    page_map = page_links.groupBy("url").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("surface"),
                    F.struct("entity_id", "canonical_name"),
                )
            )
        ).alias("_lm")
    ).transform(cut_lineage)
    j = triples.join(page_map, "url", "left")
    s_hit = F.element_at("_lm", F.col("subj"))
    o_hit = F.element_at("_lm", F.col("obj"))
    nil_subj = F.md5(F.concat(F.lit("nil:"), F.lower(F.col("subj"))))
    nil_obj = F.md5(F.concat(F.lit("nil:"), F.lower(F.col("obj"))))
    out = j.select(
        "url",
        "warc_ts",
        "subj",
        "pred",
        "obj",
        "span_start",
        "span_end",
        F.coalesce(s_hit["entity_id"], nil_subj).alias("subj_id"),
        F.coalesce(s_hit["canonical_name"], F.col("subj")).alias("subj_name"),
        F.coalesce(o_hit["entity_id"], nil_obj).alias("obj_id"),
        F.coalesce(o_hit["canonical_name"], F.col("obj")).alias("obj_name"),
    ).filter(F.col("subj_id") != F.col("obj_id"))
    return out
