"""Pure-Python reference implementations (no Spark imports).

These modules define the *semantics* the Spark engine must reproduce
byte-identically (text extraction) or at P/R >= 0.95 (triples). They are
the analog of blarify's single-threaded extraction core
(reference: blarify/code_hierarchy/tree_sitter_helper.py:103-175) and are
deliberately dependency-free so the pytest suite can run them without a
SparkSession as the golden oracle.
"""

from blarify_spark.ref.html_extract import extract_text, extract_text_bytes
from blarify_spark.ref.triples import (
    extract_mentions,
    extract_triples,
    skeletonize_text,
    split_sentences,
)

__all__ = [
    "extract_text",
    "extract_text_bytes",
    "split_sentences",
    "extract_mentions",
    "extract_triples",
    "skeletonize_text",
]
