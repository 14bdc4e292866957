"""Iterative bottom-up rollup with readiness frontier + cycle-break.

The Spark restatement of blarify's query-driven documentation engine
(reference: blarify/documentation/utils/bottom_up_batch_processor.py:184-246,
readiness query blarify/documentation/queries/batch_processing_queries.py
and repositories/graph_db_manager/queries.py:2217-2256):

* Phase 1/2 merged into one loop: each round processes every node whose
  children are ALL already processed (leaves trivially qualify — 0 of 0
  children done), i.e. the `get_processable_nodes_query` readiness
  predicate as a groupBy+join instead of a Cypher OPTIONAL MATCH.
* Work state lives in the accumulated `done` DataFrame instead of leased
  processing_status/processing_run_id columns; each round is
  localCheckpoint'ed, which is both the lineage cut and the "commit" of
  that round's lease.
* Cycle-break: after `stuck_limit` consecutive rounds with an empty
  readiness frontier while nodes remain (the reference's
  consecutive_stuck_iterations >= 2), the remaining nodes are processed
  with whatever child results exist — blarify's
  _process_remaining_functions_batch — and marked `forced`.

Scale notes: every round is one join + one aggregation keyed by node id
(md5-uniform, skew-free); rounds are bounded by tree depth + cycle-break,
so the loop count is O(hierarchy depth), never O(n).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F, types as T

from blarify_spark.functions.checkpoint import cut_lazy, cut_lineage

MAX_ROUNDS = 30
STUCK_LIMIT = 2

CHILD_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("value", T.StringType()),
        ]
    )
)


def bottom_up_rollup(
    nodes: DataFrame,
    edges: DataFrame,
    combine: Callable[[DataFrame], DataFrame],
    max_rounds: int = MAX_ROUNDS,
    stuck_limit: int = STUCK_LIMIT,
) -> DataFrame:
    """Process a (possibly cyclic) parent->child graph bottom-up.

    nodes: (node_id, name); edges: (src=parent, dst=child).
    combine: DataFrame(node_id, name, n_kids, n_done,
             children: array<struct<name,value>> sorted) -> (node_id, value)
             — computes a node's value from its children's values.

    Returns (node_id, value, round, forced): every node gets processed;
    `forced` marks nodes handled by the cycle-break pass with an
    incomplete child set.
    """
    e = edges.select("src", "dst").distinct().transform(cut_lineage)
    kids = e.groupBy("src").agg(F.count(F.lit(1)).alias("n_kids"))
    base = (
        nodes.select("node_id", "name")
        .join(kids.withColumnRenamed("src", "node_id"), "node_id", "left")
        .withColumn("n_kids", F.coalesce("n_kids", F.lit(0)))
        .transform(cut_lineage)
    )

    done = base.filter(F.lit(False)).select(
        "node_id",
        F.lit("").alias("value"),
        F.lit(0).alias("round"),
        F.lit(False).alias("forced"),
    )
    stuck = 0
    for rnd in range(1, max_rounds + 1):
        pending = base.join(done.select("node_id"), "node_id", "left_anti")
        child_vals = (
            e.join(
                done.select(F.col("node_id").alias("dst"), "value"), "dst"
            )
            .join(
                base.select(
                    F.col("node_id").alias("dst"), F.col("name").alias("cname")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("cname").alias("name"),
                            F.col("value").alias("value"),
                        )
                    )
                ).alias("children"),
                F.count(F.lit(1)).alias("n_done"),
            )
        )
        staged = (
            pending.join(
                child_vals.withColumnRenamed("src", "node_id"), "node_id", "left"
            )
            .withColumn("n_done", F.coalesce("n_done", F.lit(0)))
            .withColumn(
                "children",
                F.coalesce(
                    F.col("children"), F.from_json(F.lit("[]"), CHILD_STRUCT)
                ),
            )
        )
        # ONE driver action per round (r6): the old shape paid three —
        # pending.isEmpty(), frontier.isEmpty(), and an eager checkpoint
        # job for the done-union. One aggregate answers both emptiness
        # questions (n_pending == staged rows since the left join
        # preserves every pending row; n_ready counts the readiness
        # predicate), and it materializes the PREVIOUS round's deferred
        # done-checkpoint as a side effect, so each round is exactly one
        # job plus its AQE stages.
        stats = staged.agg(
            F.count(F.lit(1)).alias("n_pending"),
            F.count(
                F.when(F.col("n_done") == F.col("n_kids"), F.lit(1))
            ).alias("n_ready"),
        ).collect()[0]
        if stats["n_pending"] == 0:
            break
        frontier = staged.filter(F.col("n_done") == F.col("n_kids"))
        forced = False
        if stats["n_ready"] == 0:
            stuck += 1
            if stuck < stuck_limit:
                continue  # mirror the reference's stuck counter verbatim
            # cycle-break: force-process only pending nodes that are
            # themselves CHILDREN (edge dsts) — the reference forces the
            # remaining FUNCTION nodes (cycle members), never the
            # requested root, so ancestors above the cycle still roll up
            # normally next round. Non-empty whenever stuck: a non-ready
            # pending node always has a pending child, and that child is
            # a dst.
            frontier = staged.join(
                e.select(F.col("dst").alias("node_id")).distinct(),
                "node_id",
                "left_semi",
            )
            forced = True
        stuck = 0
        new = combine(frontier).select(
            "node_id",
            "value",
            F.lit(rnd).alias("round"),
            F.lit(forced).alias("forced"),
        )
        # deferred: materializes inside the next round's stats aggregate
        # (full-coverage), or the caller's terminal action on the last
        # round — consumers of the returned frame are joins/aggregates
        done = done.unionByName(new).transform(cut_lazy)
    else:
        # the loop exhausted max_rounds without draining the frontier:
        # a hierarchy deeper than max_rounds (or repeated cycle-breaks)
        # would otherwise silently return a `done` set missing nodes
        # (ADVICE r02) — fail loudly instead
        n_left = base.join(done.select("node_id"), "node_id", "left_anti").count()
        if n_left:
            raise RuntimeError(
                f"bottom_up_rollup: {n_left} nodes still pending after "
                f"{max_rounds} rounds — raise max_rounds (hierarchy deeper "
                f"than the round budget)"
            )
    return done


def json_tree_combine(frontier: DataFrame) -> DataFrame:
    """Q2 hierarchy-assembly combine: a node's value is its JSON subtree
    {"name": ..., "children": [...]} with children in deterministic
    (name, value) sort order — the DataFrame analog of blarify's
    build_hierarchy + format_hierarchy_tree recursion
    (repositories/graph_db_manager/queries.py:269-375)."""
    name_json = F.to_json(F.struct(F.col("name")))  # escapes quotes for us
    with_children = F.concat(
        F.regexp_replace(name_json, r"\}$", ""),
        F.lit(',"children":['),
        F.array_join(F.transform("children", lambda c: c["value"]), ","),
        F.lit("]}"),
    )
    return frontier.select(
        "node_id",
        F.when(F.size("children") > 0, with_children)
        .otherwise(name_json)
        .alias("value"),
    )


def count_combine(frontier: DataFrame) -> DataFrame:
    """Q15/Q16 processing combine: a node's value is the size of the
    subtree it has seen (1 + sum of child counts) — a stand-in for the
    reference's LLM description step that keeps the scheduling/leasing
    semantics observable and deterministic."""
    total = F.lit(1) + F.aggregate(
        "children",
        F.lit(0),
        lambda acc, c: acc + c["value"].cast("int"),
    )
    return frontier.select(
        "node_id", total.cast("string").alias("value")
    )
