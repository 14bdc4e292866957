"""Oracled graph-traversal operators over a derived relational graph.

The customer–supplier bipartite graph (an edge whenever an order line
links a customer to a supplier) is the relational analog of the KG's
entity graph, and gives the driver an ORACLED mirror of the engine's
traversal loop: kg_khop_reach / kg_workflow_paths (SURVEY.md §2 Q6,
blarify queries.py DFS) are rows-only by necessity (engine-built graph),
but here the SAME frontier-iteration pattern runs over a SQL-derivable
graph, so DuckDB can re-derive the answer with a recursive CTE — two
independent algorithms (distributed BFS vs declarative fixpoint), one
value-hash.

Scale notes: the edge list is built once with a distinct projection and
lineage-cut; each BFS round is one shuffle on the frontier key plus a
left-anti against the visited set — frontier-sized jobs, not
corpus-sized. At 100 TB the visited set stays partitioned on node (no
driver collect anywhere), and the hop bound caps total work at
O(hops * edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from blarify_spark.functions.checkpoint import cut_lineage
from blarify_spark.operators.registry import register
from blarify_spark.sources.tables import load_tables

SEED_SUPPKEY = 1
MAX_HOPS = 3


@register(
    "bfs_khop_customer_supplier",
    oracle=f"""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT 'C' || CAST(o_custkey AS VARCHAR) AS a,
                      'S' || CAST(l_suppkey AS VARCHAR) AS b
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), sym AS (
      SELECT a, b FROM edges
      UNION
      SELECT b AS a, a AS b FROM edges
    ), walk(node, hops) AS (
      SELECT 'S{SEED_SUPPKEY}' AS node, 0 AS hops
      UNION
      SELECT s.b AS node, w.hops + 1 AS hops
      FROM walk w JOIN sym s ON s.a = w.node
      WHERE w.hops < {MAX_HOPS}
    )
    SELECT node, CAST(MIN(hops) AS INT) AS hops
    FROM walk GROUP BY node
    ORDER BY node
    """,
)
def bfs_khop_customer_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-hop BFS (depth <= MAX_HOPS) from supplier SEED_SUPPKEY over the
    undirected customer–supplier bipartite graph. Emits every reachable
    node ('C<custkey>' / 'S<suppkey>') with its shortest hop distance.

    Spark side: iterative frontier BFS — per round, one equi-join of the
    frontier against the symmetric edge list, distinct, left-anti against
    the visited set, lineage-cut. The oracle's recursive CTE enumerates
    bounded walks and takes MIN(hops); shortest-path = min walk length, so
    the two agree exactly. Mirrors blarify's k-hop traversal
    (queries.py:938 DFS-with-depth) on an oracle-checkable graph."""
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    edges = (
        t["orders"]
        .select("o_orderkey", "o_custkey")
        .join(
            t["lineitem"].select("l_orderkey", "l_suppkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("a"),
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("b"),
        )
        .distinct()
    )
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).transform(cut_lineage)

    seed = spark.createDataFrame(
        [(f"S{SEED_SUPPKEY}", 0)], "node string, hops int"
    )
    dist = seed
    frontier = seed.select("node")
    for h in range(1, MAX_HOPS + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["a"])
            .select(F.col("b").alias("node"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .transform(cut_lineage)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).transform(cut_lineage)
        frontier = nxt.select("node")
    return dist.orderBy("node")
