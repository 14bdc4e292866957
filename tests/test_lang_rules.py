"""E4 per-language rule dispatch tests.

Pins the language-dispatched predicate lexicons (blarify's extension ->
LanguageDefinitions map, project_graph_creator.py:42-53): same canonical
predicate from different surface grammars, EN base lexicon always active,
unknown languages fall back to EN.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from blarify_spark.ref import extract_triples


def _spo(text, lang):
    return [(t["subj"], t["pred"], t["obj"]) for t in extract_triples(text, lang)]


def test_german_lexicon_dispatch():
    de = "Umbrella Labs liegt in Zürich."
    assert _spo(de, "de") == [("Umbrella Labs", "located_in", "Zürich")]
    # the German phrase is NOT active under the EN rule set
    assert _spo(de, "en") == []
    # German article stripped from the object
    assert _spo("Acme übernahm die Initech.", "de") == [
        ("Acme", "acquired", "Initech")
    ]


def test_french_lexicon_dispatch():
    fr = "Paris est la capitale de la France."
    assert _spo(fr, "fr") == [("Paris", "capital_of", "France")]
    assert _spo(fr, "en") == []


def test_en_base_lexicon_always_active_and_unknown_lang_falls_back():
    mixed = "Hooli acquired Pied Piper."
    # English predicates fire on every page regardless of its language
    assert _spo(mixed, "de") == [("Hooli", "acquired", "Pied Piper")]
    assert _spo(mixed, "xx") == [("Hooli", "acquired", "Pied Piper")]
    assert _spo(mixed, None) == [("Hooli", "acquired", "Pied Piper")]


def test_spark_side_dispatch_by_lang_column(spark):
    from blarify_spark.plans.extract import extract_all_stage, triples_from
    from blarify_spark.sources.pages import pages_from_rows

    html = (
        "<html><body><p>Umbrella Labs liegt in Zürich.</p></body></html>"
    ).encode()
    rows = [
        {
            "url": f"u://{lang}",
            "warc_ts": None,
            "html": html,
            "text": None,
            "lang": lang,
            "family": "test",
        }
        for lang in ["de", "en"]
    ]
    got = {
        r["url"]: (r["subj"], r["pred"], r["obj"])
        for r in triples_from(
            extract_all_stage(pages_from_rows(spark, rows))
        ).collect()
    }
    # same bytes, different lang column -> different rule set fires
    assert got == {"u://de": ("Umbrella Labs", "located_in", "Zürich")}


def test_corpus_renders_translated_predicates(spark):
    from blarify_spark import corpus
    from blarify_spark.plans.extract import extract_all_stage, triples_from
    from blarify_spark.sources.pages import pages_from_rows

    pages = pages_from_rows(spark, corpus.generate_pages(64))
    t = triples_from(extract_all_stage(pages))
    de_fr = t.filter(F.col("lang").isin("de", "fr"))
    assert de_fr.count() > 0  # non-English pages still yield triples
    # and at least one fired through a translated (non-EN-surface) rule
    texts = {
        r["text"]
        for r in extract_all_stage(pages)
        .filter(F.col("lang").isin("de", "fr"))
        .select("text")
        .collect()
    }
    assert any(
        ("liegt in" in x) or ("est la capitale de" in x) or ("übernahm" in x)
        or ("a acquis" in x) or ("est situé à" in x)
        for x in texts
    )


import pytest


@pytest.mark.parametrize(
    "lang,sentence,expected",
    [
        ("es", "Umbrella Labs se encuentra en Madrid.",
         ("Umbrella Labs", "located_in", "Madrid")),
        ("es", "Acme adquirió la Initech.", ("Acme", "acquired", "Initech")),
        ("it", "Umbrella Labs si trova in Milano.",
         ("Umbrella Labs", "located_in", "Milano")),
        ("it", "Acme acquisì la Initech.", ("Acme", "acquired", "Initech")),
        ("pt", "Umbrella Labs está localizada em Lisboa.",
         ("Umbrella Labs", "located_in", "Lisboa")),
        ("pt", "Acme adquiriu a Initech.", ("Acme", "acquired", "Initech")),
        ("de", "Umbrella Labs liegt in Zürich.",
         ("Umbrella Labs", "located_in", "Zürich")),
        ("fr", "Paris est la capitale de la France.",
         ("Paris", "capital_of", "France")),
        ("nl", "Umbrella Labs is gevestigd in Amsterdam.",
         ("Umbrella Labs", "located_in", "Amsterdam")),
        ("nl", "Acme verwierf de Initech.", ("Acme", "acquired", "Initech")),
        ("sv", "Umbrella Labs ligger i Stockholm.",
         ("Umbrella Labs", "located_in", "Stockholm")),
        ("sv", "Acme förvärvade Initech.", ("Acme", "acquired", "Initech")),
        ("da", "Umbrella Labs ligger i Aarhus.",
         ("Umbrella Labs", "located_in", "Aarhus")),
        ("da", "Acme opkøbte Initech.", ("Acme", "acquired", "Initech")),
        ("pl", "Umbrella Labs znajduje się w Warszawa.",
         ("Umbrella Labs", "located_in", "Warszawa")),
        ("pl", "Acme przejęła Initech.", ("Acme", "acquired", "Initech")),
    ],
)
def test_language_matrix_dispatch(lang, sentence, expected):
    """E4 matrix across all 9 non-EN lexicons (10-language dispatch,
    project_graph_creator.py:42-53 breadth analog): in-language predicate
    fires with the canonical name + article stripped; silent under EN."""
    assert _spo(sentence, lang) == [expected]
    assert _spo(sentence, "en") == []


def test_sv_da_shared_surface_dispatches_in_both():
    """'ligger i' exists in BOTH the Swedish and Danish lexicons —
    per-language dispatch must fire it under each, proving lexicons are
    independent even when surfaces collide."""
    s = "Umbrella Labs ligger i Oslo."
    assert _spo(s, "sv") == [("Umbrella Labs", "located_in", "Oslo")]
    assert _spo(s, "da") == [("Umbrella Labs", "located_in", "Oslo")]
    assert _spo(s, "en") == []


@pytest.mark.parametrize("lang", ["es", "it", "pt", "nl", "sv", "da", "pl"])
def test_new_languages_keep_en_base_active(lang):
    assert _spo("Hooli acquired Pied Piper.", lang) == [
        ("Hooli", "acquired", "Pied Piper")
    ]


def test_spark_side_dispatch_new_language(spark):
    from blarify_spark.plans.extract import extract_all_stage, triples_from
    from blarify_spark.sources.pages import pages_from_rows

    html = (
        "<html><body><p>Umbrella Labs se encuentra en Madrid.</p>"
        "</body></html>"
    ).encode()
    rows = [
        {
            "url": f"u://{lang}",
            "warc_ts": None,
            "html": html,
            "text": None,
            "lang": lang,
            "family": "test",
        }
        for lang in ["es", "en"]
    ]
    got = {
        r["url"]: (r["subj"], r["pred"], r["obj"])
        for r in triples_from(
            extract_all_stage(pages_from_rows(spark, rows))
        ).collect()
    }
    assert got == {"u://es": ("Umbrella Labs", "located_in", "Madrid")}
