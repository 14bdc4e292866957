"""Bucketed co-located join tests (SURVEY.md §2.6 bucketing strategy).

Proves the storage-layout contract: two tables written bucketed+sorted on
their join key join with NO shuffle exchange (pure co-located
SortMergeJoin), while the identical join over unbucketed data shuffles
both sides — the difference that dominates repeated joins at 100 TB.
"""

from __future__ import annotations

import pytest

from blarify_spark.plans.bucketing import bucketed_join, write_bucketed


@pytest.fixture()
def graph_tables(spark):
    nodes = spark.range(0, 5000).selectExpr(
        "md5(cast(id as string)) as canon_id", "id as payload"
    )
    edges = spark.range(0, 20000).selectExpr(
        "md5(cast(id % 5000 as string)) as subj_id", "id as e"
    )
    write_bucketed(nodes, "t_nodes_b", "canon_id")
    write_bucketed(edges, "t_edges_b", "subj_id")
    yield nodes, edges
    spark.sql("DROP TABLE IF EXISTS t_nodes_b")
    spark.sql("DROP TABLE IF EXISTS t_edges_b")


def test_bucketed_join_elides_shuffle(spark, graph_tables):
    nodes, edges = graph_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_edges_b", "t_nodes_b", "subj_id", "canon_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located buckets
        assert j.count() == 20000

        # control: the same join over unbucketed data shuffles both sides
        un = edges.join(nodes, edges.subj_id == nodes.canon_id)
        p2 = un._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in p2
        assert un.count() == 20000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_write_is_idempotent_overwrite(spark, graph_tables):
    nodes, _ = graph_tables
    write_bucketed(nodes, "t_nodes_b", "canon_id")  # overwrite same table
    assert spark.table("t_nodes_b").count() == 5000
