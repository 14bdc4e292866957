"""Graph sink abstraction — pluggable storage backends (SURVEY.md S7-S10).

Blarify writes its graph through an AbstractDbManager with two concrete
backends, Neo4j and FalkorDB, both exposing the same idempotent
save_graph(nodes, edges) contract via batched upsert-by-key
(reference: blarify/repositories/graph_db_manager/db_manager.py,
neo4j_manager.py:87-197 — apoc.merge on (hashed_id, ...), batch 1000
nodes / 10000 edges — and falkordb_manager.py:41-88).

The Spark restatement keeps the same shape:

* GraphSink        — the abstract contract: idempotent keyed upsert of a
                     nodes table and an edges table (+ delete-by-key, the
                     detach-delete analog).
* ParquetSink      — the production backend: key-based upsert into
                     partitioned parquet dirs (Iceberg MERGE INTO
                     stand-in), fully distributed writes.
* DuckDBSink       — the alternate backend: streams Arrow batches from
                     toLocalIterator through one connection with
                     INSERT .. ON CONFLICT upserts, mirroring blarify's
                     single-bolt-socket batched writes (batch size 1000
                     like neo4j_manager.py:96). Single-writer by design —
                     the demo/second-backend path, not the 100 TB path
                     (that is ParquetSink/Iceberg).
"""

from __future__ import annotations

import os
from abc import ABC, abstractmethod

from pyspark.sql import DataFrame, SparkSession

NODE_KEYS = ["node_id"]
EDGE_KEYS = ["src", "dst", "pred"]
BATCH_ROWS = 1000  # blarify node batch size (neo4j_manager.py:96)


class GraphSink(ABC):
    """Idempotent keyed graph storage: re-applying the same save is a
    no-op (apoc.merge semantics)."""

    @abstractmethod
    def save_nodes(self, nodes: DataFrame) -> None: ...

    @abstractmethod
    def save_edges(self, edges: DataFrame) -> None: ...

    @abstractmethod
    def delete_nodes_by_key(self, node_ids: list[str]) -> None:
        """Detach-delete analog (neo4j_manager.py:210-224): removes the
        nodes and every edge touching them."""

    @abstractmethod
    def counts(self) -> tuple[int, int]:
        """(n_nodes, n_edges) currently stored."""

    def save_graph(self, nodes: DataFrame, edges: DataFrame) -> None:
        self.save_nodes(nodes)
        self.save_edges(edges)


class ParquetSink(GraphSink):
    """Distributed parquet/Iceberg-style backend (the scale path)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.nodes_path = os.path.join(root, "nodes")
        self.edges_path = os.path.join(root, "edges")

    def save_nodes(self, nodes: DataFrame) -> None:
        from blarify_spark.plans.materialize import upsert_parquet

        upsert_parquet(self.spark, nodes, self.nodes_path, NODE_KEYS)

    def save_edges(self, edges: DataFrame) -> None:
        from blarify_spark.plans.materialize import upsert_parquet

        upsert_parquet(self.spark, edges, self.edges_path, EDGE_KEYS)

    def delete_nodes_by_key(self, node_ids: list[str]) -> None:
        from blarify_spark.plans.materialize import upsert_parquet  # noqa: F401

        if not os.path.exists(self.nodes_path):
            return
        gone = set(node_ids)
        nodes = self.spark.read.parquet(self.nodes_path)
        nodes.filter(~nodes["node_id"].isin(gone)).write.mode(
            "overwrite"
        ).parquet(self.nodes_path + ".__new__")
        _swap(self.nodes_path)
        if os.path.exists(self.edges_path):
            edges = self.spark.read.parquet(self.edges_path)
            edges.filter(
                ~edges["src"].isin(gone) & ~edges["dst"].isin(gone)
            ).write.mode("overwrite").parquet(self.edges_path + ".__new__")
            _swap(self.edges_path)

    def counts(self) -> tuple[int, int]:
        n = (
            self.spark.read.parquet(self.nodes_path).count()
            if os.path.exists(self.nodes_path)
            else 0
        )
        e = (
            self.spark.read.parquet(self.edges_path).count()
            if os.path.exists(self.edges_path)
            else 0
        )
        return n, e


def _swap(path: str) -> None:
    import shutil

    old = path + ".__old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(path + ".__new__", path)
    shutil.rmtree(old, ignore_errors=True)


class DuckDBSink(GraphSink):
    """Alternate single-writer backend over a DuckDB file database."""

    def __init__(self, db_path: str):
        import duckdb

        self.db_path = db_path
        self.con = duckdb.connect(db_path)
        self.con.execute(
            "CREATE TABLE IF NOT EXISTS nodes ("
            "node_id VARCHAR PRIMARY KEY, name VARCHAR, n_mentions BIGINT)"
        )
        self.con.execute(
            "CREATE TABLE IF NOT EXISTS edges ("
            "src VARCHAR, dst VARCHAR, pred VARCHAR, url VARCHAR, "
            "PRIMARY KEY (src, dst, pred))"
        )

    def _stream_upsert(self, df: DataFrame, cols: list[str], sql: str) -> None:
        """Batched driver-side streaming like blarify's bolt writes:
        toLocalIterator never materializes the whole table; each batch is
        one transactional multi-row upsert."""
        batch: list[tuple] = []

        def _flush() -> None:
            if not batch:
                return
            self.con.executemany(sql, batch)
            batch.clear()

        for row in df.select(*cols).toLocalIterator():
            batch.append(tuple(row))
            if len(batch) >= BATCH_ROWS:
                _flush()
        _flush()

    def save_nodes(self, nodes: DataFrame) -> None:
        self._stream_upsert(
            nodes,
            ["node_id", "name", "n_mentions"],
            "INSERT INTO nodes VALUES (?, ?, ?) ON CONFLICT (node_id) "
            "DO UPDATE SET name = excluded.name, "
            "n_mentions = excluded.n_mentions",
        )

    def save_edges(self, edges: DataFrame) -> None:
        self._stream_upsert(
            edges,
            ["src", "dst", "pred", "url"],
            "INSERT INTO edges VALUES (?, ?, ?, ?) ON CONFLICT (src, dst, pred) "
            "DO UPDATE SET url = excluded.url",
        )

    def delete_nodes_by_key(self, node_ids: list[str]) -> None:
        self.con.execute(
            "DELETE FROM edges WHERE src IN (SELECT unnest(?)) "
            "OR dst IN (SELECT unnest(?))",
            [node_ids, node_ids],
        )
        self.con.execute(
            "DELETE FROM nodes WHERE node_id IN (SELECT unnest(?))", [node_ids]
        )

    def counts(self) -> tuple[int, int]:
        n = self.con.execute("SELECT COUNT(*) FROM nodes").fetchone()[0]
        e = self.con.execute("SELECT COUNT(*) FROM edges").fetchone()[0]
        return int(n), int(e)

    def close(self) -> None:
        self.con.close()
