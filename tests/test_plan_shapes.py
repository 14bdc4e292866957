"""Physical-plan shape gates for the 100x-scale fixes.

Asserts via explain() that the round-2 scale fixes hold structurally:
no unpartitioned window over a full row table, entry-point-seeded k-hop,
broadcast rule/dictionary joins — so a regression reintroducing a global
sort or an all-roots closure fails CI, not a cluster run.
"""

from __future__ import annotations

import re


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _window_specs(plan: str) -> list[str]:
    # windowspecdefinition(<partition cols...>, <order...>, specifiedwindowframe...)
    return re.findall(r"windowspecdefinition\(([^)]*)\)", plan)


def test_workflow_paths_windows_are_partitioned_by_root(spark):
    from blarify_spark.operators.kg_queries import _kg, _workflow_traces

    plan = _plan(_workflow_traces(_kg(spark)))
    specs = _window_specs(plan)
    assert specs, "expected window operators in the trace plan"
    for spec in specs:
        assert spec.split("#")[0].strip().startswith("root"), spec


def test_paginated_triples_has_no_full_table_global_window(spark):
    from blarify_spark.operators.registry import all_queries

    df = all_queries()["kg_paginated_triples"](spark, "unused")
    plan = _plan(df)
    specs = _window_specs(plan)
    # the per-row ranking window must be partitioned by url; the only
    # unpartitioned window may be the offsets window over the per-url
    # COUNT table (one row per url, not per triple)
    row_windows = [s for s in specs if s.split("#")[0].strip().startswith("url")]
    assert row_windows, f"expected a url-partitioned ranking window: {specs}"
    unpartitioned = [s for s in specs if s.lstrip().startswith("url") is False]
    # any remaining window must sit above an Aggregate (count per url);
    # cheap structural proxy: the plan aggregates by url before sorting
    if unpartitioned:
        assert "count(1)" in plan or "count(" in plan


def test_khop_seeds_from_entry_points_only(spark):
    """The k-hop frontier starts from the entry-point anti-join, never
    from all nodes: root count == entry-point count < node count."""
    from pyspark.sql import functions as F

    from blarify_spark.operators.registry import all_queries

    qs = all_queries()
    reach = qs["kg_khop_reach"](spark, "unused")
    entry = qs["kg_entrypoint_entities"](spark, "unused")
    nodes = qs["kg_nodes"](spark, "unused")
    n_entry, n_nodes = entry.count(), nodes.count()
    assert n_entry < n_nodes
    n_roots = reach.select("root").distinct().count()
    assert n_roots <= n_entry


def test_innermost_range_join_pushes_key_filter_to_scan(spark):
    from blarify_spark.operators.registry import all_queries
    from tests.conftest import SF_DIR

    df = all_queries()["range_join_innermost"](spark, SF_DIR)
    plan = _plan(df)
    # the l_orderkey < 200 bound must reach both parquet scans, and each
    # scan may read only the columns its side needs (column pruning)
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert len(scans) >= 2, plan[:400]
    allowed = {"l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"}
    for cols in scans:
        names = {c.split("#")[0] for c in cols.split(",")}
        assert names <= allowed, names
    assert plan.count("l_orderkey") and "< 200" in plan


def test_linking_uses_broadcast_alias_join(spark):
    from blarify_spark import corpus
    from blarify_spark.plans.extract import extract_all_stage, mentions_from
    from blarify_spark.plans.linking import link_mentions
    from blarify_spark.sources.alias import alias_dict
    from blarify_spark.sources.pages import pages_from_rows

    pages = extract_all_stage(
        pages_from_rows(spark, corpus.generate_pages(8))
    )
    plan = _plan(link_mentions(mentions_from(pages), alias_dict(spark)))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
