#!/usr/bin/env python
"""Capture .explain('formatted') for the kg_canonicalize composite.

kg_canonicalize is not a single DataFrame: canonicalize() runs eager
materialization barriers (band table, CC pair list) as separate jobs.
So the artifact captures, per tree:

  [A] the LSH band -> candidate-pair plan as a single unbroken plan
      (what executes inside the barrier jobs: signature computation,
      bucket cap, self-join, Jaccard verify)
  [B] the final `nodes` and `edges` plans the bench actions count
      (these read the materialized mapping through whatever barrier the
      tree uses)

Usage:
    PYTHONPATH=<tree-root> python probes/canon_plan_capture.py <tag>
writes plans/r06/kg_canonicalize_<tag>.txt in the CURRENT repo.
"""

from __future__ import annotations

import os
import sys

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    "r06",
    f"kg_canonicalize_{TAG}.txt",
)

import pandas as pd  # noqa: F401

# Default to the current repo; PYTHONPATH=<other-tree> overrides (its
# entry precedes this append in sys.path).
sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    from blarify_spark.session import get_spark

    spark = get_spark(cores=8, app_name="canon_plan_capture")

    from blarify_spark import corpus
    from blarify_spark.plans import canonicalize as C
    from blarify_spark.plans.extract import (
        extract_all_stage,
        mentions_from,
        triples_from,
    )
    from blarify_spark.plans.linking import resolve_triples
    from blarify_spark.sources.alias import alias_dict
    from blarify_spark.sources.pages import pages_from_rows

    pages = (
        pages_from_rows(
            spark,
            corpus.generate_pages(2000, facts_range=(2, 5), synth_entities=2000),
        )
        .repartition(32)
        .cache()
    )
    pages.count()
    extracted = extract_all_stage(pages).persist()
    triples = resolve_triples(
        triples_from(extracted), mentions_from(extracted), alias_dict(spark)
    ).persist()
    triples.count()

    sections: list[tuple[str, str]] = []
    raw_nodes = C.build_entity_nodes(triples)

    # [A] unbroken band->pair plan (no materialization barrier), the work
    # the barrier jobs execute
    try:
        bands = C.cap_bands(C.lsh_bands_raw(raw_nodes))
        pairs = C.pairs_from_bands(bands)
        sections.append(
            ("[A] LSH bands -> verified candidate pairs (unbroken plan)",
             _explain(pairs))
        )
    except AttributeError:
        # older tree: lsh_bands had no separate raw/materialized split;
        # candidate_pairs() is the same unbroken plan there
        pairs = C.candidate_pairs(raw_nodes)
        sections.append(
            ("[A] LSH bands -> verified candidate pairs (unbroken plan)",
             _explain(pairs))
        )

    # [B] the bench-counted outputs
    nodes, edges, _mapping = C.canonicalize(triples)
    sections.append(("[B1] canonical nodes (bench: nodes.count())", _explain(nodes)))
    sections.append(("[B2] remapped edges (bench: edges.count())", _explain(edges)))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        for title, body in sections:
            fh.write(f"==== {title} ====\n{body}\n\n")
    print("wrote", OUT)
    spark.stop()


if __name__ == "__main__":
    main()
