"""Sink abstraction (S7-S10) + content-hash cache pattern tests.

Pins: both GraphSink backends implement the same idempotent keyed-upsert
contract (blarify AbstractDbManager with Neo4j/FalkorDB backends,
repositories/graph_db_manager/db_manager.py, falkordb_manager.py:41-88),
and the dedup-before-expensive-UDF cache pattern
(services/embedding_service.py:109-144).
"""

from __future__ import annotations

import pytest

from blarify_spark.sinks import DuckDBSink, ParquetSink


def _graph(spark, extra=False):
    nodes = [("n1", "Ada", 3), ("n2", "Turing", 2)]
    edges = [("n1", "n2", "cites", "u://a")]
    if extra:
        nodes.append(("n3", "Hopper", 1))
        edges.append(("n2", "n3", "cites", "u://b"))
    ndf = spark.createDataFrame(
        nodes, "node_id string, name string, n_mentions long"
    )
    edf = spark.createDataFrame(edges, "src string, dst string, pred string, url string")
    return ndf, edf


@pytest.fixture(params=["parquet", "duckdb"])
def sink(request, spark, tmp_path):
    if request.param == "parquet":
        yield ParquetSink(spark, str(tmp_path / "graph"))
    else:
        s = DuckDBSink(str(tmp_path / "graph.duckdb"))
        yield s
        s.close()


def test_sink_save_is_idempotent(spark, sink):
    nodes, edges = _graph(spark)
    sink.save_graph(nodes, edges)
    assert sink.counts() == (2, 1)
    sink.save_graph(nodes, edges)  # re-apply: merge, not duplicate
    assert sink.counts() == (2, 1)


def test_sink_upsert_updates_and_inserts(spark, sink):
    nodes, edges = _graph(spark)
    sink.save_graph(nodes, edges)
    nodes2, edges2 = _graph(spark, extra=True)
    sink.save_graph(nodes2, edges2)
    assert sink.counts() == (3, 2)


def test_sink_detach_delete(spark, sink):
    nodes, edges = _graph(spark, extra=True)
    sink.save_graph(nodes, edges)
    sink.delete_nodes_by_key(["n2"])
    # n2 gone AND both edges touching n2 gone (detach semantics)
    assert sink.counts() == (2, 0)


def test_content_hash_cache_computes_once_per_distinct(spark):
    """The expensive step's input is the deduped hash set, not the corpus:
    with duplicated texts, the UDF-side row count equals the number of
    DISTINCT contents while every doc still receives a feature."""
    from pyspark.sql import functions as F

    from blarify_spark.functions.udfs import ctx_embedding_udf

    docs = spark.createDataFrame(
        [(i, "same text here" if i % 2 else f"unique text {i}") for i in range(10)],
        "doc_id int, text string",
    )
    hashed = docs.select("doc_id", F.md5("text").alias("h"), "text")
    distinct = hashed.select("h", "text").dropDuplicates(["h"])
    assert distinct.count() == 6  # 5 unique + 1 shared
    feats = distinct.select(
        "h",
        ctx_embedding_udf(F.split("text", " ")).alias("emb"),
    )
    served = hashed.join(feats, "h").select("doc_id", "emb")
    assert served.count() == 10  # every doc served from 6 computations
    embs = {r["doc_id"]: tuple(r["emb"]) for r in served.collect()}
    assert embs[1] == embs[3] == embs[9]  # shared content, shared vector


def test_clear_kg_caches_unpersists_everything(spark):
    """VERDICT r04 #3: the module-level fixture-graph memos (_CACHE /
    _CACHE_WF / _CACHE2) must release every cached DataFrame on an
    explicit clear — no storage held for the session's lifetime."""
    from pyspark.sql import DataFrame

    from blarify_spark.operators import kg_queries as kq

    # populate all three memo layers
    kq._kg(spark)
    kq._kg_wf(spark)
    kq._kg_incr(spark)

    cached = [
        v
        for cache in (kq._CACHE, kq._CACHE_WF, kq._CACHE2)
        for entry in cache.values()
        for v in entry.values()
        if isinstance(v, DataFrame) and v.storageLevel.useMemory
    ]
    assert cached, "expected memoized DataFrames to be cached"

    kq.clear_kg_caches()
    assert not kq._CACHE and not kq._CACHE_WF and not kq._CACHE2
    for df in cached:
        assert not df.storageLevel.useMemory, "DataFrame still cached"
