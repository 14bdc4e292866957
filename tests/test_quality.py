"""Semantic pins for the repetition-quality and contamination operators
(operators/quality.py) on crafted documents with hand-computed answers —
the DuckDB parity test covers engine agreement; these pin the MEANING.
"""

from __future__ import annotations

import pandas as pd
import pytest

from blarify_spark.operators.quality import (
    contamination_ngram_overlap,
    text_repetition_stats,
)


def _docs(tmp_path, rows):
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "source", "n_chars"])
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_repetition_stats_hand_computed(spark, tmp_path):
    sf_dir = _docs(
        tmp_path,
        [
            (1, "a a a a", "s", 7),  # pure repetition
            (2, "a b c d", "s", 7),  # no repetition
            (3, "x y x y x", "s", 9),  # alternating boilerplate
            (4, "solo", "s", 4),  # single token: no 2-grams at all
        ],
    )
    got = {r["doc_id"]: r for r in text_repetition_stats(spark, sf_dir).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["top_word_frac"] == 1.0
    assert got[1]["type_token_ratio"] == 0.25
    assert got[1]["dup_2gram_frac"] == 1.0  # "a a" x3, all duplicated

    assert got[2]["top_word_frac"] == 0.25
    assert got[2]["type_token_ratio"] == 1.0
    assert got[2]["dup_2gram_frac"] == 0.0

    assert got[3]["n_tokens"] == 5
    assert got[3]["top_word_frac"] == 0.6  # x appears 3/5
    assert got[3]["type_token_ratio"] == 0.4
    # grams: (x y) x2, (y x) x2 -> 4/4 occurrences duplicated
    assert got[3]["dup_2gram_frac"] == 1.0

    assert got[4]["n_tokens"] == 1
    assert got[4]["dup_2gram_frac"] == 0.0  # left-join path, coalesced


def test_contamination_hand_computed(spark, tmp_path):
    bench = "b1 b2 b3 b4 b5 b6 b7 b8 b9"  # doc_id 0 -> benchmark slice
    tail = " ".join(f"u{i}" for i in range(20))
    sf_dir = _docs(
        tmp_path,
        [
            (0, bench, "s", len(bench)),
            (1, bench, "s", len(bench)),  # verbatim benchmark copy
            (2, "c1 c2 c3 c4 c5 c6 c7 c8 c9", "s", 26),  # unrelated
            (3, "z0 b1 b2 b3 b4 b5 b6 b7 b8", "s", 26),  # half overlap
            (4, f"b1 b2 b3 b4 b5 b6 b7 b8 {tail}", "s", 80),  # dilute
        ],
    )
    got = {
        r["doc_id"]: r for r in contamination_ngram_overlap(spark, sf_dir).collect()
    }
    # benchmark docs and non-overlapping docs emit no row
    assert set(got) == {1, 3, 4}
    # doc 1: both of its 2 shingles are benchmark shingles
    assert (got[1]["n_shingles"], got[1]["n_overlap"]) == (2, 2)
    assert got[1]["overlap_frac"] == 1.0 and got[1]["contaminated"] == 1
    # doc 3: shingles {z0..b7, b1..b8}; only the second is benchmark
    assert (got[3]["n_shingles"], got[3]["n_overlap"]) == (2, 1)
    assert got[3]["contaminated"] == 1  # 0.5 >= 0.2
    # doc 4: 1 benchmark shingle out of 21 -> under the flag threshold
    assert got[4]["n_shingles"] == 21 and got[4]["n_overlap"] == 1
    assert got[4]["contaminated"] == 0
    assert got[4]["overlap_frac"] == pytest.approx(round(1 / 21, 6))


def test_contamination_benchmark_join_is_broadcast(spark):
    """The benchmark shingle set must be the broadcast build side — the
    corpus side never shuffles on shingle (the 100 TB plan shape)."""
    from tests.conftest import SF_DIR

    plan = contamination_ngram_overlap(spark, SF_DIR)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
