"""The north-rule correctness gate, stated explicitly:

(subj, pred, obj) set precision/recall >= 0.95 overall vs the pure-Python
reference extractor, and == 1.0 on the `simple` family (FIXTURES.md §3).
The engine's extraction is exact by construction; the 5% slack exists for
linking-threshold variation only (SURVEY.md §7 hard-parts).
"""

from __future__ import annotations

from blarify_spark import corpus
from blarify_spark.plans.extract import extract_all_stage, triples_from
from blarify_spark.ref import extract_text_bytes, extract_triples


def _pr(got: set, expected: set) -> tuple[float, float]:
    if not got or not expected:
        return 0.0, 0.0
    tp = len(got & expected)
    return tp / len(got), tp / len(expected)


def test_spo_precision_recall_gate(spark, fixture_pages):
    got = {
        (r["url"], r["subj"], r["pred"], r["obj"])
        for r in triples_from(extract_all_stage(fixture_pages)).collect()
    }
    expected = set()
    for row in corpus.generate_pages(64):
        for t in extract_triples(extract_text_bytes(row["html"]), row["lang"]):
            expected.add((row["url"], t["subj"], t["pred"], t["obj"]))

    precision, recall = _pr(got, expected)
    assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.4f} < 0.95"

    # simple family must be exact
    simple_got = {t for t in got if "/simple/" in t[0]}
    simple_exp = {t for t in expected if "/simple/" in t[0]}
    assert simple_got == simple_exp
    p2, r2 = _pr(simple_got, simple_exp)
    assert p2 == 1.0 and r2 == 1.0
