"""blarify_spark — PySpark-native knowledge-graph construction over web text.

A from-scratch reimagination of blarApp/blarify's hierarchical graph builder
(reference: /root/reference, studied for semantics only), retargeted from
code repositories to Common-Crawl-style web pages:

    pages(url, warc_ts, html, text, lang)
      -> HTML-to-text extraction        (vectorized Arrow/pandas UDFs)
      -> mention + SVO triple extraction
      -> entity linking                 (broadcast alias dictionary)
      -> canonicalization               (MinHash-LSH + connected components)
      -> partitioned nodes/edges/triples tables with lineage + resume

Everything is DataFrame/Catalyst-first; Python appears only inside
Arrow-batched pandas UDFs (never row-at-a-time UDFs).
"""

__version__ = "0.1.0"
