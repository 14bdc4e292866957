"""Deterministic HTML -> text extraction (pure Python, stdlib only).

This is the reference twin of the Spark-side Arrow UDF
(blarify_spark.functions.udfs.extract_text_column). The engine's
per-row invariant is BYTE-IDENTICAL output between this module and the
vectorized UDF for every url (BASELINE.json `input_hint`).

Semantics mirror blarify's file-content read policy, retargeted to HTML:

* decode failure -> empty string, document retained (not dropped), like
  blarify's empty-string-on-UnicodeDecodeError read
  (reference: blarify/code_hierarchy/tree_sitter_helper.py:124-130) and
  RAW-node fallback (tree_sitter_helper.py:83-86,224-236).
* boilerplate containers (script/style/nav/header/footer/aside/template/
  noscript/iframe/svg) are dropped wholesale — the analog of blarify's
  scan-side skip rules (project_file_explorer/project_files_iterator.py:85-100).
* block-level tags delimit lines; inline whitespace is collapsed; entity
  references are decoded.

The implementation is a single-pass HTMLParser state machine — O(n) per
document, allocation-light, safe to run inside Arrow batches.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Tags whose entire content is boilerplate and must be dropped.
_DROP_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "nav",
        "header",
        "footer",
        "aside",
        "template",
        "iframe",
        "svg",
    }
)

# Tags that open/close a text block (emit a line break).
_BLOCK_TAGS = frozenset(
    {
        "title",
        "p",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "li",
        "div",
        "section",
        "article",
        "main",
        "table",
        "tr",
        "td",
        "th",
        "ul",
        "ol",
        "blockquote",
        "pre",
        "figcaption",
        "br",
        "body",
        "html",
    }
)

_WS_RE = re.compile(r"[ \t\r\f\v]+")


class _TextExtractor(HTMLParser):
    """Single-pass extractor: accumulates text chunks per block."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0
        self._chunks: list[str] = []  # current block's inline chunks
        self._lines: list[str] = []

    # -- block handling -------------------------------------------------
    def _flush_block(self) -> None:
        if not self._chunks:
            return
        line = _WS_RE.sub(" ", "".join(self._chunks)).strip()
        self._chunks = []
        if line:
            self._lines.append(line)

    # -- parser callbacks ----------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _DROP_TAGS:
            self._drop_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush_block()

    def handle_endtag(self, tag: str) -> None:
        if tag in _DROP_TAGS:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if tag in _BLOCK_TAGS:
            self._flush_block()

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _BLOCK_TAGS:
            self._flush_block()

    def handle_data(self, data: str) -> None:
        if self._drop_depth == 0 and data:
            self._chunks.append(data)

    # -- result ---------------------------------------------------------
    def result(self) -> str:
        self._flush_block()
        return "\n".join(self._lines)


def extract_text(html: str) -> str:
    """Extract readable text from an HTML string. Deterministic, pure."""
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # Malformed markup never crashes extraction; emit what was
        # accumulated so far (RAW-fallback analog).
        pass
    return parser.result()


def extract_text_bytes(html: bytes | None) -> str:
    """Extract text from raw HTML bytes.

    Strict UTF-8 decode; any decode failure yields "" (the document row
    is retained upstream with extract_status='raw').
    """
    if html is None:
        return ""
    try:
        decoded = html.decode("utf-8", errors="strict")
    except (UnicodeDecodeError, ValueError):
        return ""
    return extract_text(decoded)
