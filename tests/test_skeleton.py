"""E6 skeletonize tests: byte-exact parity + placeholder mechanics.

Pins the Spark restatement of blarify's child-body placeholder rewrite
(graph/node/types/definition_node.py:100-138): span arithmetic, hashed
placeholder per replaced span, following-newline removal.
"""

from __future__ import annotations

import hashlib

from blarify_spark.ref import (
    extract_text_bytes,
    extract_triples,
    skeletonize_text,
)


def test_skeletonize_replaces_span_with_hashed_placeholder():
    text = "Intro line. Hooli acquired Pied Piper. Tail line."
    span = (12, 38)  # the fact sentence
    node_id = hashlib.md5(text[12:38].encode()).hexdigest()
    got = skeletonize_text(text, [span])
    assert got == (
        "Intro line. "
        f"# Code replaced for brevity, see node: {node_id}\n"
        " Tail line."
    )


def test_skeletonize_drops_following_newline_and_handles_multi_spans():
    text = "AAA.\nBBB.\nCCC."
    got = skeletonize_text(text, [(0, 4), (5, 9)])
    ids = [
        hashlib.md5(b"AAA.").hexdigest(),
        hashlib.md5(b"BBB.").hexdigest(),
    ]
    # each placeholder carries its own newline; the newline that followed
    # the replaced span is dropped (remove_line_break_if_present analog)
    assert got == (
        f"# Code replaced for brevity, see node: {ids[0]}\n"
        f"# Code replaced for brevity, see node: {ids[1]}\n"
        "CCC."
    )


def test_skeletonize_skips_overlapping_and_out_of_range_spans():
    text = "0123456789"
    gid = hashlib.md5(b"0123").hexdigest()
    assert skeletonize_text(text, [(0, 4), (2, 6), (8, 99)]) == (
        f"# Code replaced for brevity, see node: {gid}\n456789"
    )
    assert skeletonize_text(text, []) == text


def test_spark_skeleton_column_matches_pure_python(spark, fixture_pages):
    """Byte-exact: the fused UDF's text_skeleton equals the reference
    composition extract_text -> extract_triples -> skeletonize_text."""
    from blarify_spark import corpus
    from blarify_spark.plans.extract import extract_all_stage

    got = {
        r["url"]: r["text_skeleton"]
        for r in extract_all_stage(fixture_pages)
        .select("url", "text_skeleton")
        .collect()
    }
    rows = corpus.generate_pages(64)
    assert len(got) == len(rows)
    for r in rows:
        text = extract_text_bytes(r["html"])
        spans = [(t["start"], t["end"]) for t in extract_triples(text, r["lang"])]
        assert got[r["url"]] == skeletonize_text(text, spans), r["url"]
