"""Property-based tests (hypothesis) over the pure-Python golden core.

The reference ships no property tests (SURVEY.md §5); these pin the
invariants the Spark pipeline leans on for arbitrary inputs, not just the
fixture corpus: span validity, extraction totality (never raises), and
skeletonize's length/offset arithmetic.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from blarify_spark.ref import (
    extract_mentions,
    extract_triples,
    skeletonize_text,
    split_sentences,
)

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_sentence_spans_index_back_into_text(text):
    for s in split_sentences(text):
        assert 0 <= s["start"] <= s["end"] <= len(text)
        assert text[s["start"] : s["end"]] == s["text"]


@given(TEXT, st.sampled_from(["en", "de", "fr", "xx", None]))
@settings(max_examples=200, deadline=None)
def test_extraction_is_total_and_spans_valid(text, lang):
    for m in extract_mentions(text):
        assert text[m["start"] : m["end"]] == m["surface"]
    for t in extract_triples(text, lang):
        assert 0 <= t["start"] <= t["end"] <= len(text)
        # the triple's parts all come from its provenance sentence
        sent = text[t["start"] : t["end"]]
        assert t["subj"] in sent


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_skeletonize_of_extracted_spans_never_raises_and_is_stable(text):
    spans = [(t["start"], t["end"]) for t in extract_triples(text)]
    out = skeletonize_text(text, spans)
    assert skeletonize_text(text, spans) == out  # deterministic
    if not spans:
        assert out == text
    else:
        # every placeholder line appears exactly once per replaced span
        assert out.count("# Code replaced for brevity, see node: ") == len(
            spans
        )


@given(
    st.text(max_size=120),
    st.lists(
        st.tuples(st.integers(-5, 130), st.integers(-5, 130)), max_size=8
    ),
)
@settings(max_examples=300, deadline=None)
def test_skeletonize_tolerates_arbitrary_span_garbage(text, spans):
    # overlapping / inverted / out-of-range spans are skipped, never fatal
    out = skeletonize_text(text, [tuple(s) for s in spans])
    assert isinstance(out, str)
