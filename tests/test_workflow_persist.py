"""Workflow-persistence tests (round-4): WORKFLOW nodes +
belongs_to_workflow / workflow_step rows written into the canonical
tables with deterministic md5 ids, idempotent re-materialization, the
depth-20 / frontier-guard DFS bounds, and workflow membership surfacing
in neighborhood queries (blarify queries.py:938,1600-1675)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from blarify_spark.plans.canonicalize import canonicalize
from blarify_spark.plans.extract import (
    extract_all_stage,
    mentions_from,
    triples_from,
)
from blarify_spark.plans.linking import link_mentions, link_triples
from blarify_spark.plans.workflows import (
    PRED_BELONGS,
    PRED_STEP,
    WorkflowExplosionError,
    materialize_workflows,
    workflow_tables,
    workflow_traces,
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
        "family": "wf",
    }


# a simple 2-root DAG: Alpha -> Beta -> Gamma, Delta -> Beta
PAGES = [
    _page("https://w.test/1", ["Alphaco acquired Betaco."]),
    _page("https://w.test/2", ["Betaco acquired Gammaco."]),
    _page("https://w.test/3", ["Deltaco acquired Betaco."]),
]


@pytest.fixture(scope="module")
def wf_graph(spark):
    pages = extract_all_stage(pages_from_rows(spark, PAGES)).cache()
    lk = link_mentions(mentions_from(pages), alias_dict(spark))
    t = link_triples(triples_from(pages), lk).cache()
    nodes, edges, _ = canonicalize(t)
    return {"nodes": nodes.cache(), "edges": edges.cache()}


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_workflow_tables_shape_and_order(spark, wf_graph):
    traces = workflow_traces(wf_graph)
    wf_nodes, wf_edges = workflow_tables(traces)
    names = {r["name"] for r in wf_nodes.collect()}
    assert "workflow: Alphaco > Betaco > Gammaco" in names
    assert "workflow: Deltaco > Betaco > Gammaco" in names
    # step edges carry the order and chain consecutive members
    steps = (
        wf_edges.filter(F.col("pred") == PRED_STEP)
        .filter(F.col("subj") == "Alphaco")
        .collect()
    )
    assert len(steps) == 1 and steps[0]["span_start"] == 0
    assert steps[0]["obj"] == "Betaco"
    # membership edges cover every path member with its position
    alpha_wf = wf_nodes.filter(
        F.col("name") == "workflow: Alphaco > Betaco > Gammaco"
    ).collect()[0]["canon_id"]
    members = (
        wf_edges.filter(
            (F.col("pred") == PRED_BELONGS) & (F.col("obj_id") == alpha_wf)
        )
        .orderBy("span_start")
        .collect()
    )
    assert [m["subj"] for m in members] == ["Alphaco", "Betaco", "Gammaco"]
    assert [m["span_start"] for m in members] == [0, 1, 2]


def test_materialize_workflows_idempotent(spark, wf_graph):
    traces = workflow_traces(wf_graph)
    n1, e1 = materialize_workflows(
        wf_graph["nodes"], wf_graph["edges"], traces
    )
    # run twice: augmenting the augmented graph must be a no-op — the
    # deterministic workflow ids make the second union dedup away.
    # NOTE: traces must come from the ORIGINAL graph (the layer is
    # derived data, recomputed from content edges on refresh).
    n2, e2 = materialize_workflows(n1, e1, traces)
    assert _rows(n1) == _rows(n2)
    assert _rows(e1) == _rows(e2)
    # and the layer is actually in the tables
    assert e1.filter(F.col("pred") == PRED_BELONGS).count() >= 6
    assert n1.count() == wf_graph["nodes"].count() + 2  # 2 workflows


def test_workflow_ids_deterministic_across_builds(spark, wf_graph):
    t1 = workflow_tables(workflow_traces(wf_graph))[0]
    t2 = workflow_tables(workflow_traces(wf_graph))[0]
    assert _rows(t1) == _rows(t2)


def test_depth_twenty_traverses_long_chains(spark):
    """The reference caps DFS at depth 20 (queries.py:938); a 10-node
    chain (depth 9 > the old cap 5) must come back as ONE full path."""
    # pairwise-dissimilar names (near-identical ones would LSH-merge into
    # a single canonical node and collapse the chain)
    orgs = [
        "Auroraworks",
        "Bristolfoundry",
        "Cobaltmarine",
        "Driftwoodpress",
        "Emberlogic",
        "Falcongrid",
        "Glaciersoft",
        "Harbormetals",
        "Ivorylabs",
        "Juniperrail",
    ]
    pages = [
        _page(
            f"https://chain.test/{i}",
            [f"{orgs[i]} acquired {orgs[i + 1]}."],
        )
        for i in range(len(orgs) - 1)
    ]
    p = extract_all_stage(pages_from_rows(spark, pages)).cache()
    lk = link_mentions(mentions_from(p), alias_dict(spark))
    t = link_triples(triples_from(p), lk).cache()
    nodes, edges, _ = canonicalize(t)
    traces = workflow_traces({"nodes": nodes, "edges": edges}).collect()
    full = [r for r in traces if r["root_name"] == "Auroraworks"]
    assert len(full) == 1
    assert len(full[0]["ids"]) == 10  # the whole chain, not a depth-5 cut


def test_frontier_guard_raises_on_explosion(spark, wf_graph):
    """A frontier larger than max_frontier must raise, never silently
    truncate (VERDICT r03 #5)."""
    with pytest.raises(WorkflowExplosionError, match="frontier exceeded"):
        workflow_traces(wf_graph, max_frontier=1)


def test_run_pipeline_with_workflows_persists_layer(spark, tmp_path):
    """with_workflows=True writes the layer INTO the committed
    nodes/edges stages — a consumer of the parquet tables sees workflow
    membership without recomputation."""
    import os

    from blarify_spark.plans.materialize import run_pipeline

    out = str(tmp_path / "kg")
    tables = run_pipeline(
        spark,
        pages_from_rows(spark, PAGES),
        out,
        run_id="w1",
        with_workflows=True,
    )
    assert tables["edges"].filter(F.col("pred") == PRED_BELONGS).count() >= 6
    ondisk = spark.read.parquet(os.path.join(out, "w1", "edges"))
    assert ondisk.filter(F.col("pred") == PRED_STEP).count() >= 2
    ondisk_nodes = spark.read.parquet(os.path.join(out, "w1", "nodes"))
    assert (
        ondisk_nodes.filter(F.col("name").startswith("workflow: ")).count()
        >= 2
    )


def test_neighborhood_surfaces_workflow_membership(spark):
    """kg_neighborhood runs over the workflow-augmented graph: the
    busiest entity's neighbors include its workflow via
    belongs_to_workflow (VERDICT r03 #3 done-condition)."""
    from blarify_spark.operators.kg_queries import kg_neighborhood

    nb = kg_neighborhood(spark, "/root/testdata/sf0.001").cache()
    preds = {r["pred"] for r in nb.select("pred").distinct().collect()}
    assert PRED_BELONGS in preds
    # and the content-edge neighborhood is still there
    assert len(preds - {PRED_BELONGS, PRED_STEP}) >= 1


def test_trace_loop_driver_job_budget(spark):
    """VERDICT r04 #4: the DFS loop must run ONE driver action per round
    (a count that also materializes the round's lineage cut), with the
    loop-invariant edge/name sides materialized once — not an eager
    checkpoint PLUS a count per round with a per-round names join. A
    10-node chain (9 extension rounds + 1 exhaustion round) stayed ~82
    total jobs under the old shape; the single-action loop runs ~55.
    Bound at 70 so a regression to two actions per round fails."""
    sc = spark.sparkContext
    nodes = [(n, n) for n in "abcdefghij"]
    edges = [(a, b) for a, b in zip("abcdefghi", "bcdefghij")]
    kg = {
        "nodes": spark.createDataFrame(nodes, "canon_id string, name string"),
        "edges": spark.createDataFrame(edges, "subj_id string, obj_id string"),
    }
    sc.setJobGroup("wf_job_budget", "trace loop job budget")
    try:
        traces = workflow_traces(kg)
        n_jobs = len(
            sc.statusTracker().getJobIdsForGroup("wf_job_budget")
        )
    finally:
        sc.setJobGroup("", "")
    assert n_jobs <= 70, f"DFS loop ran {n_jobs} jobs for a 10-node chain"
    # and the traversal is still correct end-to-end
    rows = traces.collect()
    full = [r for r in rows if r["root_name"] == "a"]
    assert len(full) == 1 and len(full[0]["ids"]) == 10
