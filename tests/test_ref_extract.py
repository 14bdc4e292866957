"""Unit tests for the pure-Python reference extractor (no Spark).

These pin the golden semantics every Spark stage is compared against
(SURVEY.md §5 adaptation: text byte-equality + exact triple sets).
"""

from blarify_spark import corpus
from blarify_spark.ref import (
    extract_mentions,
    extract_text,
    extract_text_bytes,
    extract_triples,
    split_sentences,
)


def test_extract_text_strips_boilerplate():
    html = (
        "<html><head><title>My Title</title><script>var x=1;</script>"
        "<style>p{}</style></head><body>"
        "<nav><ul><li>Home</li></ul></nav>"
        "<p>Hello   world.</p><p>Second&nbsp;para.</p>"
        "<footer>legal</footer></body></html>"
    )
    text = extract_text(html)
    assert text == "My Title\nHello world.\nSecond\xa0para."
    assert "var x" not in text
    assert "Home" not in text
    assert "legal" not in text


def test_extract_text_bytes_decode_error_yields_empty():
    assert extract_text_bytes(b"\xff\xfe\x80 not utf8") == ""
    assert extract_text_bytes(None) == ""
    assert extract_text_bytes(b"<p>ok</p>") == "ok"


def test_extract_text_malformed_markup_no_crash():
    assert extract_text("<p>unclosed <div>odd</p>") != None  # noqa: E711


def test_split_sentences_offsets():
    text = "First one. Second two.\nTitle Line\nThird three!"
    sents = split_sentences(text)
    assert [s["text"] for s in sents] == [
        "First one.",
        "Second two.",
        "Title Line",
        "Third three!",
    ]
    for s in sents:
        assert text[s["start"] : s["end"]] == s["text"]


def test_svo_extraction_basic():
    text = "Ada Lovelace wrote the first program."
    triples = extract_triples(text)
    assert len(triples) == 1
    t = triples[0]
    assert (t["subj"], t["pred"], t["obj"]) == (
        "Ada Lovelace",
        "wrote",
        "first program",
    )


def test_svo_multiword_predicates_and_articles():
    text = (
        "Paris is the capital of France. "
        "Acme Corp was founded by Wile Coyote. "
        "Hooli acquired Pied Piper. "
        "Mercury is a planet."
    )
    got = {(t["subj"], t["pred"], t["obj"]) for t in extract_triples(text)}
    assert got == {
        ("Paris", "capital_of", "France"),
        ("Acme Corp", "founded_by", "Wile Coyote"),
        ("Hooli", "acquired", "Pied Piper"),
        ("Mercury", "is_a", "planet"),
    }


def test_svo_rejects_noise():
    assert extract_triples("the following paragraph continues on.") == []
    assert extract_triples("See also the archive section.") == []
    # Subject must be a full entity match anchored at start.
    assert extract_triples("yesterday Hooli acquired Pied Piper.") == []


def test_mentions_have_valid_spans():
    text = "Ada Lovelace wrote the first program.\nmore about Hooli"
    mentions = extract_mentions(text)
    surfaces = {m["surface"] for m in mentions}
    assert "Ada Lovelace" in surfaces
    assert "Hooli" in surfaces
    for m in mentions:
        assert text[m["start"] : m["end"]] == m["surface"]


def test_corpus_determinism_and_families():
    p1 = corpus.generate_pages(64)
    p2 = corpus.generate_pages(64)
    assert [p["url"] for p in p1] == [p["url"] for p in p2]
    assert [p["html"] for p in p1] == [p["html"] for p in p2]
    fams = {p["family"] for p in p1}
    assert fams == {
        "simple",
        "duplicate_entities",
        "cyclic_links",
        "skewed_head",
        "raw_garbage",
    }
    assert len({p["url"] for p in p1}) == len(p1)


def test_corpus_simple_pages_have_expected_triples():
    pages = corpus.generate_pages(64)
    simple = [p for p in pages if p["family"] == "simple"]
    assert len(simple) > 10
    for p in simple[:5]:
        text = extract_text_bytes(p["html"])
        assert text  # extraction succeeds
        assert len(extract_triples(text, p["lang"])) >= 2  # 2-5 fact sentences


def test_corpus_raw_garbage_yields_empty_or_partial_text():
    pages = corpus.generate_pages(64)
    garbage = [p for p in pages if p["family"] == "raw_garbage"]
    assert len(garbage) == 3
    # invalid-utf8 pages must yield "" (not crash)
    assert extract_text_bytes(garbage[0]["html"]) == ""
    assert extract_text_bytes(garbage[2]["html"]) == ""


def test_incremental_snapshot_semantics():
    pages = corpus.generate_pages(64)
    snap2 = corpus.generate_incremental_snapshot(pages)
    urls1 = {p["url"] for p in pages}
    urls2 = {p["url"] for p in snap2}
    assert len(urls1 - urls2) == 1  # deleted
    assert len(urls2 - urls1) == 3  # added
    by_url1 = {p["url"]: p["html"] for p in pages}
    modified = [
        u for u in (urls1 & urls2) if by_url1[u] != {p["url"]: p["html"] for p in snap2}[u]
    ]
    assert len(modified) == 2


def test_alias_dict_has_ambiguous_alias():
    rows = corpus.alias_rows()
    by_alias = {}
    for r in rows:
        by_alias.setdefault(r["alias"], set()).add(r["entity_id"])
    assert len(by_alias["mercury"]) == 2
    assert all(len(r["ctx_embedding"]) == corpus.EMB_DIM for r in rows)
