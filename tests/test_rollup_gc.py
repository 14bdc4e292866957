"""Bottom-up rollup (Q2/Q15/Q16) + empty-container GC (Q18) tests.

Pins the readiness-frontier loop with stuck-twice cycle-break against
blarify's control flow (bottom_up_batch_processor.py:184-246) and the
iterative empty-folder GC (prebuilt/graph_builder.py:247-259) on
hand-built graphs, including the reference's cyclic fixtures
(tests/code_examples/circular_deps analog).
"""

from __future__ import annotations

from blarify_spark.plans.gc import gc_empty_containers
from blarify_spark.plans.rollup import (
    bottom_up_rollup,
    count_combine,
    json_tree_combine,
)


def _graph(spark, names, edges):
    nodes = spark.createDataFrame(
        [(n, n) for n in names], "node_id string, name string"
    )
    e = spark.createDataFrame(edges, "src string, dst string")
    return nodes, e


def _rolled(spark, names, edges, combine=count_combine):
    nodes, e = _graph(spark, names, edges)
    return {
        r["node_id"]: (r["value"], r["round"], r["forced"])
        for r in bottom_up_rollup(nodes, e, combine).collect()
    }


def test_rollup_tree_bottom_up_order_and_counts(spark):
    got = _rolled(
        spark, ["a", "b", "c", "d"], [("a", "b"), ("a", "c"), ("b", "d")]
    )
    # leaves first, parents only when ALL children done, subtree sizes
    assert got == {
        "d": ("1", 1, False),
        "c": ("1", 1, False),
        "b": ("2", 2, False),
        "a": ("4", 3, False),
    }


def test_rollup_cycle_break_forces_cycle_members_only(spark):
    # r -> x, x <-> y: no leaf exists below x, so the loop is stuck; after
    # 2 empty rounds the cycle members (edge dsts) are force-processed,
    # then r completes NORMALLY with its child done
    got = _rolled(spark, ["r", "x", "y"], [("r", "x"), ("x", "y"), ("y", "x")])
    assert set(got) == {"r", "x", "y"}  # every node processed (terminates)
    assert got["x"][2] and got["y"][2]  # cycle members forced
    assert got["r"][2] is False  # root rolled up normally afterwards
    assert got["r"][1] > got["x"][1]


def test_rollup_json_tree_assembly(spark):
    nodes, e = _graph(
        spark, ["a", "b", "c", "d"], [("a", "b"), ("a", "c"), ("b", "d")]
    )
    got = {
        r["node_id"]: r["value"]
        for r in bottom_up_rollup(nodes, e, json_tree_combine).collect()
    }
    assert got["d"] == '{"name":"d"}'
    assert got["b"] == '{"name":"b","children":[{"name":"d"}]}'
    assert (
        got["a"]
        == '{"name":"a","children":[{"name":"b","children":[{"name":"d"}]},'
        '{"name":"c"}]}'
    )


def _gc(spark, nodes, edges):
    ndf = spark.createDataFrame(nodes, "node_id string, kind string")
    edf = spark.createDataFrame(edges, "src string, dst string")
    alive, deleted = gc_empty_containers(ndf, edf)
    return (
        sorted(r["node_id"] for r in alive.collect()),
        {r["node_id"]: r["round"] for r in deleted.collect()},
    )


def test_gc_cascades_up_empty_chain(spark):
    # root -> mid -> tip (all containers, tip empty): tip dies round 1,
    # mid round 2, root round 3 — the iterate-to-fixpoint cascade
    nodes = [("root", "container"), ("mid", "container"), ("tip", "container")]
    edges = [("root", "mid"), ("mid", "tip")]
    alive, deleted = _gc(spark, nodes, edges)
    assert alive == []
    assert deleted == {"tip": 1, "mid": 2, "root": 3}


def test_gc_keeps_containers_with_leaves_and_never_deletes_leaves(spark):
    # root -> {full -> leaf, empty}: only `empty` is collected; root
    # survives because `full` remains
    nodes = [
        ("root", "container"),
        ("full", "container"),
        ("empty", "container"),
        ("leaf", "leaf"),
    ]
    edges = [("root", "full"), ("root", "empty"), ("full", "leaf")]
    alive, deleted = _gc(spark, nodes, edges)
    assert alive == ["full", "leaf", "root"]
    assert deleted == {"empty": 1}


def test_rollup_raises_when_round_budget_too_small(spark):
    """ADVICE r02: a hierarchy deeper than max_rounds must raise, not
    silently return a done-set missing the upper nodes."""
    import pytest

    names = ["n0", "n1", "n2", "n3", "n4"]
    chain = [(f"n{i}", f"n{i+1}") for i in range(4)]  # depth 5
    nodes, e = _graph(spark, names, chain)
    with pytest.raises(RuntimeError, match="still pending"):
        bottom_up_rollup(nodes, e, count_combine, max_rounds=3)
    # enough rounds: every node present
    got = bottom_up_rollup(nodes, e, count_combine, max_rounds=5).collect()
    assert len(got) == 5


def test_gc_raises_when_round_budget_too_small(spark):
    """Same guard on the GC loop: empty containers left alive by an
    exhausted round budget must raise."""
    import pytest

    names = ["c0", "c1", "c2", "c3"]
    nodes = spark.createDataFrame(
        [(n, "container", n) for n in names],
        "node_id string, kind string, name string",
    )
    e = spark.createDataFrame(
        [(f"c{i}", f"c{i+1}") for i in range(3)], "src string, dst string"
    )
    with pytest.raises(RuntimeError, match="empty containers remain"):
        gc_empty_containers(nodes, e, max_rounds=2)
    alive, deleted = gc_empty_containers(nodes, e, max_rounds=4)
    assert alive.count() == 0 and deleted.count() == 4
