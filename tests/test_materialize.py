"""Materialize + resume + incremental-update tests (FIXTURES.md §3 gates)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from blarify_spark import corpus
from blarify_spark.plans.diff import classify_pages, incremental_triples
from blarify_spark.plans.extract import extract_text_stage, triples_stage
from blarify_spark.plans.materialize import (
    read_manifest,
    run_pipeline,
    stage_committed,
)
from blarify_spark.ref import extract_text_bytes, extract_triples
from blarify_spark.sources.pages import pages_from_rows


def _snap(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def out_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("kg_out"))


def test_full_pipeline_materializes_with_manifests(spark, fixture_pages, out_dir):
    tables = run_pipeline(spark, fixture_pages, out_dir, run_id="r1")
    assert tables["triples"].count() > 100
    assert tables["nodes"].count() > 10
    assert tables["edges"].count() > 100
    for stage in ["extract", "triples", "linked", "nodes", "edges"]:
        assert stage_committed(out_dir, "r1", stage), stage
        m = read_manifest(out_dir, "r1", stage)
        assert m["rows_out"] > 0
        assert sum(r["rows_out"] for r in m["lineage"]) == m["rows_out"]


def test_resume_skips_completed_stages_and_is_identical(
    spark, fixture_pages, out_dir
):
    before = _snap(
        spark.read.parquet(os.path.join(out_dir, "r1", "edges")),
        ["url", "pred", "subj_id", "obj_id"],
    )
    # simulate kill-after-stage-k: drop manifests for the last two stages
    for stage in ["nodes", "edges"]:
        os.remove(os.path.join(out_dir, "_manifest", "r1", f"{stage}.json"))
        shutil.rmtree(os.path.join(out_dir, "r1", stage))
    tables = run_pipeline(spark, fixture_pages, out_dir, run_id="r1")
    after = _snap(tables["edges"], ["url", "pred", "subj_id", "obj_id"])
    assert before == after


def test_rerun_full_is_idempotent(spark, fixture_pages, out_dir, tmp_path):
    d2 = str(tmp_path / "kg2")
    t1 = run_pipeline(spark, fixture_pages, out_dir, run_id="r1")
    t2 = run_pipeline(spark, fixture_pages, d2, run_id="rX")
    cols = ["url", "pred", "subj_id", "obj_id", "subj", "obj"]
    assert _snap(t1["edges"], cols) == _snap(t2["edges"], cols)


def test_classify_pages_diff(spark, fixture_pages):
    rows = corpus.generate_pages(64)
    snap2 = pages_from_rows(spark, corpus.generate_incremental_snapshot(rows))
    changes = classify_pages(fixture_pages, snap2)
    counts = {
        r["change"]: r["n"]
        for r in changes.groupBy("change").agg(F.count("*").alias("n")).collect()
    }
    assert counts["ADDED"] == 3
    assert counts["DELETED"] == 1
    assert counts["MODIFIED"] == 2
    assert counts["UNCHANGED"] == 61


def test_classify_pages_moved_urls(spark, fixture_pages):
    """Renamed urls match via relative_id: content-identical -> MOVED,
    edited -> MODIFIED, both with old_url; no ADDED/DELETED residue."""
    rows = corpus.generate_pages(64)
    snap = pages_from_rows(spark, corpus.generate_moved_snapshot(rows))
    changes = classify_pages(fixture_pages, snap).cache()
    by_change = {
        r["change"]: r["n"]
        for r in changes.groupBy("change").agg(F.count("*").alias("n")).collect()
    }
    assert by_change.get("MOVED") == 1
    assert by_change.get("MODIFIED") == 1
    assert "ADDED" not in by_change
    assert "DELETED" not in by_change
    moved = changes.filter(F.col("old_url").isNotNull()).collect()
    assert len(moved) == 2
    for r in moved:
        assert r["url"].startswith("https://mirror.test/")
        assert r["old_url"] != r["url"]
        # relative path preserved across the move
        assert r["url"].split("/", 3)[3] == r["old_url"].split("/", 3)[3]


def test_classify_pages_null_html_uses_text_hash(spark):
    """Pages with html=NULL (pre-extracted text) must diff on text, not
    classify as ADDED via md5(NULL)=NULL."""
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    old = spark.createDataFrame(
        [
            ("u://a", None, None, "same text", "en"),
            ("u://b", None, None, "old text", "en"),
            ("u://gone", None, None, "bye", "en"),
        ],
        schema,
    )
    new = spark.createDataFrame(
        [
            ("u://a", None, None, "same text", "en"),
            ("u://b", None, None, "new text", "en"),
        ],
        schema,
    )
    got = {
        r["url"]: r["change"] for r in classify_pages(old, new).collect()
    }
    assert got == {
        "u://a": "UNCHANGED",
        "u://b": "MODIFIED",
        "u://gone": "DELETED",
    }


def test_classify_warns_on_digest_family_mismatch(spark):
    """ADVICE r03: a digests side whose hash family differs from the
    md5-computing side degrades every comparison to MODIFIED — correct
    but a silent near-full recompute. It must warn; matching families
    (our own stored md5-tagged digests) must stay silent."""
    import warnings as _w

    dschema = "url string, warc_ts timestamp, content_hash string"
    pschema = (
        "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    new = spark.createDataFrame(
        [("u://a", None, b"<p>x</p>", None, "en")], pschema
    )
    foreign = spark.createDataFrame([("u://a", None, "sha1:abc")], dschema)
    with pytest.warns(RuntimeWarning, match="digest families are disjoint"):
        got = {
            r["url"]: r["change"]
            for r in classify_pages(foreign, new).collect()
        }
    assert got == {"u://a": "MODIFIED"}  # degraded, but still correct

    # our own digests: md5-tagged values -> same family, no warning
    from blarify_spark.plans.diff import _content_hash

    own = new.select("url", "warc_ts", _content_hash(new).alias("content_hash"))
    first = own.select("content_hash").first()["content_hash"]
    assert first.startswith("md5:")
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        got = {
            r["url"]: r["change"] for r in classify_pages(own, new).collect()
        }
    assert got == {"u://a": "UNCHANGED"}

    # legacy UNtagged md5 hex (written by a pre-tagging version of this
    # pipeline) must be recognized as the md5 family (ADVICE r04) — no
    # warning, and the page classifies UNCHANGED, not MODIFIED
    legacy = own.select(
        "url",
        "warc_ts",
        F.regexp_replace("content_hash", "^md5:", "").alias("content_hash"),
    )
    with _w.catch_warnings():
        _w.simplefilter("error", RuntimeWarning)
        got = {
            r["url"]: r["change"]
            for r in classify_pages(legacy, new).collect()
        }
    assert got == {"u://a": "UNCHANGED"}


def test_incremental_triples_match_full_recompute(spark, fixture_pages):
    """Incremental merge == recompute-from-scratch on snapshot 2."""
    rows = corpus.generate_pages(64)
    snap2_rows = corpus.generate_incremental_snapshot(rows)
    snap2 = pages_from_rows(spark, snap2_rows)

    old_triples = triples_stage(extract_text_stage(fixture_pages))
    inc = incremental_triples(fixture_pages, snap2, old_triples)

    # golden: pure-Python extraction over snapshot 2
    expected = sorted(
        (r["url"], t["subj"], t["pred"], t["obj"])
        for r in snap2_rows
        for t in extract_triples(extract_text_bytes(r["html"]), r["lang"])
    )
    got = sorted(
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in inc.select("url", "subj", "pred", "obj").collect()
    )
    assert got == expected


def test_edges_partitioning_spreads_head_entity(spark, fixture_pages, out_dir):
    """Salted write: the dominant head entity must span >1 output partition."""
    edges = spark.read.parquet(os.path.join(out_dir, "r1", "edges"))
    hooli = edges.filter(F.col("subj") == "Hooli")
    nfiles = (
        hooli.select(F.input_file_name().alias("f")).distinct().count()
    )
    assert hooli.count() >= 8
    assert nfiles > 1  # head entity spread across multiple writer outputs


def test_upsert_parquet_merge_semantics(spark, tmp_path):
    from blarify_spark.plans.materialize import upsert_parquet

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], ["k", "v"]
    )
    upsert_parquet(spark, base, path, ["k"])
    # update b, insert d
    delta = spark.createDataFrame([("b", 20), ("d", 4)], ["k", "v"])
    out = upsert_parquet(spark, delta, path, ["k"])
    got = dict((r["k"], r["v"]) for r in out.collect())
    assert got == {"a": 1, "b": 20, "c": 3, "d": 4}
    # idempotent re-application
    out2 = upsert_parquet(spark, delta, path, ["k"])
    assert dict((r["k"], r["v"]) for r in out2.collect()) == got


def test_upsert_parquet_recovers_from_mid_swap_crash(spark, tmp_path):
    """Crash window between rename(path, old) and rename(tmp, path): the
    live path is absent and `.__old__` holds the only copy. The next
    upsert must restore it, not rmtree it (ADVICE r02: silent loss of
    all prior rows on recovery)."""
    import os

    from blarify_spark.plans.materialize import upsert_parquet

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    upsert_parquet(spark, base, path, ["k"])
    # simulate the crash: table renamed aside, staging never landed
    os.rename(path, path + ".__old__")
    delta = spark.createDataFrame([("b", 20), ("c", 3)], ["k", "v"])
    out = upsert_parquet(spark, delta, path, ["k"])
    got = dict((r["k"], r["v"]) for r in out.collect())
    assert got == {"a": 1, "b": 20, "c": 3}  # 'a' survived the recovery
    assert not os.path.exists(path + ".__old__")


def test_classify_pages_moved_reverse_collision(spark):
    """Two ADDED urls sharing one relative_id must not BOTH claim the
    single deleted page (ADVICE r02): exactly one MOVED row per deleted
    old_url; the losing new url stays ADDED."""
    import datetime

    mk = lambda url, text: {
        "url": url,
        "warc_ts": datetime.datetime(2025, 1, 1),
        "html": None,
        "text": text,
        "lang": "en",
    }
    old = pages_from_rows(spark, [mk("https://a.test/page/x", "same text")])
    new = pages_from_rows(
        spark,
        [
            mk("https://b.test/page/x", "same text"),  # min url -> wins
            mk("https://c.test/page/x", "same text"),  # loser -> ADDED
        ],
    )
    changes = {r["url"]: r for r in classify_pages(old, new).collect()}
    assert changes["https://b.test/page/x"]["change"] == "MOVED"
    assert changes["https://b.test/page/x"]["old_url"] == "https://a.test/page/x"
    assert changes["https://c.test/page/x"]["change"] == "ADDED"
    assert changes["https://c.test/page/x"]["old_url"] is None
    # the deleted page is claimed exactly once -> no DELETED residue
    assert "https://a.test/page/x" not in changes


def test_classify_pages_uses_ingest_time_content_hash(spark):
    """When snapshots carry a content_hash column (the WARC payload
    digest analog), classify must trust it instead of re-hashing page
    bytes — proven by giving identical html but different hashes."""
    import datetime

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content_hash", T.StringType()),
        ]
    )
    ts = datetime.datetime(2025, 1, 1)
    html = b"<html><body><p>same bytes</p></body></html>"
    old = spark.createDataFrame(
        [("https://h.test/p", ts, html, None, "en", "digest-v1")], schema
    )
    new = spark.createDataFrame(
        [("https://h.test/p", ts, html, None, "en", "digest-v2")], schema
    )
    got = classify_pages(old, new).collect()
    assert len(got) == 1 and got[0]["change"] == "MODIFIED"
    # same digest -> UNCHANGED, still no byte hashing needed
    same = classify_pages(old, old).collect()
    assert same[0]["change"] == "UNCHANGED"


def test_stage_commit_adopts_complete_uncommitted_data(spark, tmp_path):
    """OCC commit protocol (round 5): a complete final directory whose
    writer crashed between the atomic rename and the manifest write is
    ADOPTED (stages are deterministic) — compute must not re-run."""
    from blarify_spark.plans.materialize import (
        materialize_stage,
        read_manifest,
        stage_committed,
    )

    out = str(tmp_path / "kg")
    df = spark.range(10).withColumnRenamed("id", "v")
    got = materialize_stage(spark, out, "r1", "s", lambda: df, resume=True)
    assert got.count() == 10
    # simulate the crash window: manifest gone, data complete
    from blarify_spark.plans.materialize import _manifest_path
    os.remove(_manifest_path(out, "r1", "s"))
    assert not stage_committed(out, "r1", "s")

    def _boom():
        raise AssertionError("compute must not re-run over complete data")

    adopted = materialize_stage(spark, out, "r1", "s", _boom, resume=True)
    assert adopted.count() == 10
    assert stage_committed(out, "r1", "s")
    assert read_manifest(out, "r1", "s")["rows_out"] == 10


def test_stage_commit_loser_adopts_winners_table(spark, tmp_path):
    """OCC commit protocol: when a concurrent writer claims the final
    path between this writer's compute and its rename, the rename fails
    atomically and the loser adopts the winner's table; the loser's
    staging output is discarded."""
    from blarify_spark.plans.materialize import (
        _manifest_path,
        materialize_stage,
    )

    out = str(tmp_path / "kg")
    winner = spark.range(7).withColumnRenamed("id", "v")

    def compute_and_lose():
        # side effect: the "concurrent" winner lands and claims the
        # path while this writer is still computing; dropping its
        # manifest makes the loser exercise the rename-conflict adopt
        # (not the resume fast path)
        materialize_stage(
            spark, out, "r1", "s", lambda: winner, resume=True
        )
        os.remove(_manifest_path(out, "r1", "s"))
        return spark.range(999).withColumnRenamed("id", "v")

    got = materialize_stage(
        spark, out, "r1", "s", compute_and_lose, resume=False
    )
    # the pre-compute check saw no final dir (the winner landed DURING
    # compute), so the conflict surfaces at rename time
    assert got.count() == 7  # the winner's table, not the loser's 999
    staging = os.path.join(out, "r1", ".staging")
    assert not os.path.isdir(staging) or os.listdir(staging) == []


def test_stage_commit_discards_partial_final_dir(spark, tmp_path):
    """A final directory WITHOUT parquet _SUCCESS (a partial write from
    the pre-staging layout) is discarded and recomputed."""
    from blarify_spark.plans.materialize import materialize_stage

    out = str(tmp_path / "kg")
    partial = os.path.join(out, "r1", "s")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-garbage"), "w") as fh:
        fh.write("not parquet")
    df = spark.range(5).withColumnRenamed("id", "v")
    got = materialize_stage(spark, out, "r1", "s", lambda: df, resume=True)
    assert got.count() == 5
