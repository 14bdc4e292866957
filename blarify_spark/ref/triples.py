"""Rule-based mention detection and SVO triple extraction (pure Python).

Reference twin of the Spark-side pandas UDFs
(blarify_spark.functions.udfs.extract_triples_rows / extract_mentions_rows).
The engine's correctness gate compares (subj, pred, obj) sets between this
module and the Spark pipeline at P/R >= 0.95 (BASELINE.json `north_rule`);
on the `simple` fixture family the match must be exact.

This plays the role blarify's tree-sitter definition extraction plays for
code (reference: blarify/code_hierarchy/tree_sitter_helper.py:151-175 —
name / range / body extraction per AST node), restated for web sentences:

* sentence  ~ AST node
* entity mention ~ identifier occurrence (code_references/types/Reference.py)
* SVO triple ~ (source_node, relationship_type, target_node) edge
  (graph/relationship/relationship_creator.py:68-83)

Everything is deterministic, seedless, and regex-driven.
"""

from __future__ import annotations

import re
from typing import TypedDict

# ---------------------------------------------------------------------------
# Grammar
# ---------------------------------------------------------------------------

# Capitalized-phrase entity pattern: one or more Capitalized tokens,
# optionally joined by "of" / "de" (e.g. "University of Turing").
ENTITY_RE = re.compile(
    r"\b[A-Z][A-Za-z0-9'\-]*(?:(?: (?:of|de) )?[ ]?[A-Z][A-Za-z0-9'\-]*)*"
)

# Closed predicate lexicon: surface phrase -> canonical predicate name.
# Longest phrases are matched first (ordering handled at regex build).
PREDICATES: dict[str, str] = {
    "was founded by": "founded_by",
    "was written by": "written_by",
    "was acquired by": "acquired_by",
    "is the capital of": "capital_of",
    "is located in": "located_in",
    "is part of": "part_of",
    "was born in": "born_in",
    "works at": "works_at",
    "relates to": "relates_to",
    "links to": "links_to",
    "is a": "is_a",
    "wrote": "wrote",
    "founded": "founded",
    "invented": "invented",
    "discovered": "discovered",
    "acquired": "acquired",
    "created": "created",
    "developed": "developed",
    "published": "published",
    "leads": "leads",
    "cites": "cites",
}

# Per-language predicate lexicons — the E4 rule-dispatch analog (blarify
# maps file extension -> language-specific definitions,
# project_graph_creator.py:42-53, python_definitions.py:27-48). A page in
# language X parses with the EN lexicon UNION X's lexicon: real web pages
# mix languages, and unmapped predicates simply don't fire.
PREDICATES_DE: dict[str, str] = {
    "liegt in": "located_in",
    "wurde gegründet von": "founded_by",
    "ist die Hauptstadt von": "capital_of",
    "übernahm": "acquired",
    "erfand": "invented",
    "entdeckte": "discovered",
    "entwickelte": "developed",
    "arbeitet bei": "works_at",
    "schrieb": "wrote",
}
PREDICATES_FR: dict[str, str] = {
    "est situé à": "located_in",
    "a été fondée par": "founded_by",
    "est la capitale de": "capital_of",
    "a acquis": "acquired",
    "a inventé": "invented",
    "a découvert": "discovered",
    "a développé": "developed",
    "travaille chez": "works_at",
    "a écrit": "wrote",
}
PREDICATES_ES: dict[str, str] = {
    "se encuentra en": "located_in",
    "fue fundada por": "founded_by",
    "es la capital de": "capital_of",
    "adquirió": "acquired",
    "inventó": "invented",
    "descubrió": "discovered",
    "desarrolló": "developed",
    "trabaja en": "works_at",
    "escribió": "wrote",
}
PREDICATES_IT: dict[str, str] = {
    "si trova in": "located_in",
    "è stata fondata da": "founded_by",
    "è la capitale di": "capital_of",
    "acquisì": "acquired",
    "inventò": "invented",
    "scoprì": "discovered",
    "sviluppò": "developed",
    "lavora presso": "works_at",
    "scrisse": "wrote",
}
PREDICATES_PT: dict[str, str] = {
    "está localizada em": "located_in",
    "foi fundada por": "founded_by",
    "é a capital de": "capital_of",
    "adquiriu": "acquired",
    "inventou": "invented",
    "descobriu": "discovered",
    "desenvolveu": "developed",
    "trabalha na": "works_at",
    "escreveu": "wrote",
}
PREDICATES_NL: dict[str, str] = {
    "is gevestigd in": "located_in",
    "werd opgericht door": "founded_by",
    "is de hoofdstad van": "capital_of",
    "verwierf": "acquired",
    "bedacht": "invented",
    "ontdekte": "discovered",
    "ontwikkelde": "developed",
    "werkt bij": "works_at",
    "schreef": "wrote",
}
PREDICATES_SV: dict[str, str] = {
    "ligger i": "located_in",
    "grundades av": "founded_by",
    "är huvudstad i": "capital_of",
    "förvärvade": "acquired",
    "uppfann": "invented",
    "upptäckte": "discovered",
    "utvecklade": "developed",
    "arbetar på": "works_at",
    "skrev": "wrote",
}
PREDICATES_DA: dict[str, str] = {
    "ligger i": "located_in",
    "blev grundlagt af": "founded_by",
    "er hovedstad i": "capital_of",
    "opkøbte": "acquired",
    "opfandt": "invented",
    "opdagede": "discovered",
    "udviklede": "developed",
    "arbejder hos": "works_at",
    "skrev": "wrote",
}
PREDICATES_PL: dict[str, str] = {
    "znajduje się w": "located_in",
    "została założona przez": "founded_by",
    "jest stolicą": "capital_of",
    "przejęła": "acquired",
    "wynalazł": "invented",
    "odkryła": "discovered",
    "opracowała": "developed",
    "pracuje w": "works_at",
    "napisał": "wrote",
}
# 10-language dispatch — breadth parity with the reference's language map
# (project_graph_creator.py:42-53: 10 tree-sitter languages). Lexicons
# are deliberately small closed sets (the fixture-grammar analog of the
# reference's per-language definition modules); unmapped phrases simply
# don't fire.
LANG_PREDICATES: dict[str, dict[str, str]] = {
    "en": {},
    "de": PREDICATES_DE,
    "fr": PREDICATES_FR,
    "es": PREDICATES_ES,
    "it": PREDICATES_IT,
    "pt": PREDICATES_PT,
    "nl": PREDICATES_NL,
    "sv": PREDICATES_SV,
    "da": PREDICATES_DA,
    "pl": PREDICATES_PL,
}

# Leading-article strip per language (object normalization).
LANG_ARTICLES: dict[str, str] = {
    "en": r"the|a|an",
    "de": r"the|a|an|der|die|das|dem|den|ein|eine|einem|einen",
    "fr": r"the|a|an|le|la|les|un|une|l'",
    "es": r"the|a|an|el|la|los|las|un|una|unos|unas",
    "it": r"the|a|an|il|lo|la|i|gli|le|un|uno|una|l'",
    "pt": r"the|a|an|o|os|as|um|uma|uns|umas",
    "nl": r"the|a|an|de|het|een",
    "sv": r"the|a|an|en|ett|den|det|de",
    "da": r"the|a|an|en|et|den|det|de",
    "pl": r"the|a|an",  # Polish has no articles
}

_LEX_CACHE: dict[str, tuple[re.Pattern, dict[str, str], re.Pattern]] = {}


def _lang_rules(lang: str | None) -> tuple[re.Pattern, dict[str, str], re.Pattern]:
    """Compiled (predicate regex, lexicon, article regex) for a language
    — built once per language, the dispatch table itself."""
    key = lang if lang in LANG_PREDICATES else "en"
    if key not in _LEX_CACHE:
        lex = {**PREDICATES, **LANG_PREDICATES[key]}
        pred_re = re.compile(
            r" (?:"
            + "|".join(
                re.escape(p) for p in sorted(lex, key=len, reverse=True)
            )
            + r") "
        )
        art_re = re.compile(
            r"^(?:" + LANG_ARTICLES[key] + r") ", re.IGNORECASE
        )
        _LEX_CACHE[key] = (pred_re, lex, art_re)
    return _LEX_CACHE[key]


_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")
_TRAIL_PUNCT_RE = re.compile(r"[.!?,;:]+$")


class Sentence(TypedDict):
    text: str
    start: int  # char offset into the document text
    end: int


class Mention(TypedDict):
    surface: str
    start: int
    end: int
    sentence_idx: int
    ctx: str  # the containing sentence (context for entity linking)


class Triple(TypedDict):
    subj: str
    pred: str
    obj: str
    start: int  # sentence char offset (provenance span)
    end: int
    sentence_idx: int


# ---------------------------------------------------------------------------
# Sentence splitting
# ---------------------------------------------------------------------------


def split_sentences(text: str) -> list[Sentence]:
    """Split extracted text into sentences with char-offset provenance.

    Lines (blocks from html_extract) are hard boundaries; within a line,
    split after terminal punctuation followed by whitespace.
    """
    sentences: list[Sentence] = []
    offset = 0
    for line in text.split("\n"):
        pos = 0
        for part in _SENT_SPLIT_RE.split(line):
            if part:
                start = line.index(part, pos)
                pos = start + len(part)
                stripped = part.strip()
                if stripped:
                    lead = part.index(stripped[0])
                    sentences.append(
                        Sentence(
                            text=stripped,
                            start=offset + start + lead,
                            end=offset + start + lead + len(stripped),
                        )
                    )
        offset += len(line) + 1  # +1 for the "\n"
    return sentences


# ---------------------------------------------------------------------------
# Mentions
# ---------------------------------------------------------------------------


def extract_mentions(text: str) -> list[Mention]:
    """All capitalized-phrase entity mentions with spans."""
    mentions: list[Mention] = []
    for idx, sent in enumerate(split_sentences(text)):
        for m in ENTITY_RE.finditer(sent["text"]):
            mentions.append(
                Mention(
                    surface=m.group(0),
                    start=sent["start"] + m.start(),
                    end=sent["start"] + m.end(),
                    sentence_idx=idx,
                    ctx=sent["text"],
                )
            )
    return mentions


# ---------------------------------------------------------------------------
# Triples
# ---------------------------------------------------------------------------


def _extract_from_sentence(
    sent_text: str, lang: str = "en"
) -> tuple[str, str, str] | None:
    """Apply the SVO rule to one sentence; None if no match.

    Rule: ``<Entity> <predicate-phrase> <object>`` where the subject must
    be a full entity-pattern match anchored at sentence start and the
    object is the non-empty remainder (leading article + trailing
    punctuation stripped). The predicate lexicon and article list are
    dispatched per language (E4).
    """
    pred_re, lex, art_re = _lang_rules(lang)
    pm = pred_re.search(sent_text)
    if pm is None:
        return None
    subj = sent_text[: pm.start()]
    em = ENTITY_RE.match(subj)
    if em is None or em.end() != len(subj):
        return None
    obj = sent_text[pm.end() :]
    obj = _TRAIL_PUNCT_RE.sub("", obj).strip()
    obj = art_re.sub("", obj)
    if not obj:
        return None
    pred = lex[pm.group(0).strip()]
    return subj, pred, obj


def skeletonize_text(text: str, spans: list[tuple[int, int]]) -> str:
    """E6 skeletonize (blarify definition_node.py:100-138): replace each
    child span with a placeholder line keyed by the replaced content's
    md5 (our hashed_id analog), left-to-right with offset arithmetic.

    Mirrors the reference byte mechanics: the placeholder carries its own
    trailing newline and the line break following the replaced span is
    dropped (remove_line_break_if_present). Overlapping or out-of-range
    spans are skipped defensively (sentence spans never overlap by
    construction).
    """
    import hashlib

    out: list[str] = []
    pos = 0
    for start, end in sorted(spans):
        if start < pos or start >= end or end > len(text):
            continue
        out.append(text[pos:start])
        node_id = hashlib.md5(text[start:end].encode("utf-8")).hexdigest()
        out.append(f"# Code replaced for brevity, see node: {node_id}\n")
        pos = end
        if text[pos : pos + 1] == "\n":
            pos += 1
    out.append(text[pos:])
    return "".join(out)


def extract_triples(text: str, lang: str = "en") -> list[Triple]:
    """Extract (subj, pred, obj) triples with sentence-span provenance,
    using the language-dispatched rule set (E4)."""
    triples: list[Triple] = []
    for idx, sent in enumerate(split_sentences(text)):
        svo = _extract_from_sentence(sent["text"], lang)
        if svo is not None:
            subj, pred, obj = svo
            triples.append(
                Triple(
                    subj=subj,
                    pred=pred,
                    obj=obj,
                    start=sent["start"],
                    end=sent["end"],
                    sentence_idx=idx,
                )
            )
    return triples
