"""Independent-algorithm checks for the round-5 oracled additions:
near-dup clustering (CC vs driver-local union-find), bipartite BFS
(vs a pure-Python BFS on the collected edge list), and token-budget
data-mix selection (boundary-tight budget invariants + determinism).

Cross-engine value parity for all three is covered by
tests/test_oracle_parity.py (DuckDB recursive-CTE / window oracles);
these tests pin the SEMANTICS against a third, in-process computation.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

from blarify_spark.operators.dedup import dedup_cluster_reps, dedup_ngram_jaccard
from blarify_spark.operators.graphops import (
    MAX_HOPS,
    SEED_SUPPKEY,
    bfs_khop_customer_supplier,
)
from blarify_spark.operators.mixing import datamix_token_budget
from tests.conftest import SF_DIR, SF_DIR_MEDIUM


def test_cluster_reps_match_local_union_find(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_ngram_jaccard(spark, SF_DIR_MEDIUM).collect()
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    members = {x for p in pairs for x in p}
    expected = {m: find(m) for m in members}

    got = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in dedup_cluster_reps(spark, SF_DIR_MEDIUM).collect()
    }
    assert set(got) == members
    for m, (rep, size) in got.items():
        assert rep == expected[m]
        assert size == sum(1 for v in expected.values() if v == expected[m])
        assert size >= 2  # only pair-connected docs are emitted


def test_bfs_khop_matches_python_bfs(spark):
    from blarify_spark.sources.tables import load_tables

    t = load_tables(spark, SF_DIR, ["orders", "lineitem"])
    edge_rows = (
        t["orders"]
        .join(
            t["lineitem"],
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
        .collect()
    )
    adj: dict[str, set[str]] = {}
    for r in edge_rows:
        c, s = f"C{r['o_custkey']}", f"S{r['l_suppkey']}"
        adj.setdefault(c, set()).add(s)
        adj.setdefault(s, set()).add(c)
    seed = f"S{SEED_SUPPKEY}"
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] >= MAX_HOPS:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)

    got = {
        r["node"]: r["hops"]
        for r in bfs_khop_customer_supplier(spark, SF_DIR).collect()
    }
    assert got == dist
    assert got[seed] == 0
    assert max(got.values()) <= MAX_HOPS


def test_datamix_budget_tight_and_deterministic(spark):
    out = datamix_token_budget(spark, SF_DIR_MEDIUM)
    rows = out.collect()
    assert rows  # non-vacuous

    # full per-source token totals and the hash-ordered doc sequence
    from blarify_spark.sources.tables import load_tables

    t = load_tables(spark, SF_DIR_MEDIUM, ["documents"])
    toks = F.filter(F.split("text", " "), lambda x: F.length(x) > 0)
    full = (
        t["documents"]
        .select(
            "doc_id",
            "source",
            F.size(toks).alias("n"),
            F.md5(F.col("doc_id").cast("string")).alias("h"),
        )
        .collect()
    )
    totals: dict[str, int] = {}
    per_src: dict[str, list] = {}
    for r in full:
        totals[r["source"]] = totals.get(r["source"], 0) + r["n"]
        per_src.setdefault(r["source"], []).append(r)
    kept_by_src: dict[str, list] = {}
    for r in rows:
        kept_by_src.setdefault(r["source"], []).append(r)

    for src, kept in kept_by_src.items():
        kept_tokens = sum(r["n_tokens"] for r in kept)
        # within budget
        assert kept_tokens * 2 <= totals[src]
        # boundary-tight: the next doc in hash order would overflow
        order = sorted(per_src[src], key=lambda r: (r["h"], r["doc_id"]))
        kept_ids = {r["doc_id"] for r in kept}
        prefix = [r for r in order[: len(kept)]]
        assert {r["doc_id"] for r in prefix} == kept_ids  # it IS the prefix
        if len(order) > len(kept):
            nxt = order[len(kept)]
            assert (kept_tokens + nxt["n"]) * 2 > totals[src]

    # determinism: a second run picks the identical doc set
    again = {
        (r["doc_id"], r["cum_tokens"])
        for r in datamix_token_budget(spark, SF_DIR_MEDIUM).collect()
    }
    assert again == {(r["doc_id"], r["cum_tokens"]) for r in rows}
