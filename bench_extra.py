#!/usr/bin/env python
"""Phase-level profiling harness for optimization round 6 (guide §1).

bench.py is FROZEN for measurement; this file owns everything else:

* per-query noop-sink isolation timings (guide §1.4) for the headline set
* sub-phase timings for the two composite benchmarks (kg_pipeline,
  kg_canonicalize) so optimization targets the right stage
* .explain("formatted") capture to plans/r06/<name>_{before,after}.txt

Usage:
    python bench_extra.py phases            # composite sub-phase timings
    python bench_extra.py queries           # per-query noop timings
    python bench_extra.py plans before      # dump explain() for headline set
    python bench_extra.py plans after
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KG_PAGES = int(os.environ.get("SPARK_GRAFT_KG_PAGES", "12000"))
REPS = int(os.environ.get("BE_REPS", "3"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "range_join_ship_window",
    "window_rank_orders",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_scores",
    "range_join_innermost",
    "text_structure_stats",
    "content_hash_cache",
]


def _steal_pct() -> float:
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    v = list(map(int, f[1:]))
    return v[7], sum(v)


def _get_spark():
    from blarify_spark.session import get_spark

    return get_spark(cores=CPUS, app_name="bench_extra")


def _warm(spark):
    from pyspark.sql import functions as F, types as T

    for tbl in ("lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{tbl}.parquet").count()

    def _warm_fn(s: pd.Series) -> pd.Series:
        from blarify_spark.ref import extract_text_bytes  # noqa: F401

        return s

    w = F.pandas_udf(_warm_fn, T.IntegerType())
    spark.range(0, CPUS * 4, 1, CPUS).select(w(F.col("id").cast("int"))).count()


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _wait_calm(budget_s: float = 90.0, thresh: float = 1.0) -> None:
    """Hold until a 2s steal probe reads below thresh (or budget runs
    out) — the same insight as bench.py's wait_for_calm: idle waiting is
    free, a contaminated measurement is not."""
    waited = 0.0
    while waited < budget_s:
        s0, t0 = _steal_pct()
        time.sleep(2)
        waited += 2
        s1, t1 = _steal_pct()
        if 100.0 * (s1 - s0) / max(t1 - t0, 1) <= thresh:
            return
        time.sleep(3)
        waited += 3


def _timed(fn, label: str, reps: int = REPS) -> dict:
    ts = []
    for _ in range(reps):
        _wait_calm()
        s0, t0t = _steal_pct()
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        s1, t1t = _steal_pct()
        ts.append(
            {
                "sec": round(dt, 3),
                "steal_pct": round(100.0 * (s1 - s0) / max(t1t - t0t, 1), 3),
            }
        )
    best = min(t["sec"] for t in ts)
    print(f"  {label}: best={best:.3f}  {ts}", flush=True)
    return {"label": label, "best": best, "runs": ts}


def cmd_queries() -> None:
    from blarify_spark.operators.registry import all_queries

    spark = _get_spark()
    _warm(spark)
    queries = all_queries()
    out = {}
    for name in HEADLINE:
        spark.sparkContext.setJobDescription(name)
        r = _timed(lambda: _noop(queries[name](spark, SF_DIR)), name)
        out[name] = r["best"]
    print(json.dumps(out))
    spark.stop()


def _kg_pages(spark):
    from blarify_spark import corpus
    from blarify_spark.sources.pages import pages_from_rows

    rows = corpus.generate_pages(
        KG_PAGES, facts_range=(2, 5), synth_entities=2000
    )
    pages = pages_from_rows(spark, rows).repartition(CPUS * 4).cache()
    pages.count()
    return pages


def cmd_phases() -> None:
    from pyspark.storagelevel import StorageLevel  # noqa: F401

    from blarify_spark.plans.extract import (
        extract_all_stage,
        mentions_from,
        triples_from,
    )
    from blarify_spark.plans.linking import (
        page_entity_links,
        resolve_triples,
    )
    from blarify_spark.sources.alias import alias_dict

    spark = _get_spark()
    _warm(spark)
    pages = _kg_pages(spark)

    # steady-state warmup identical to bench.py
    warm_pages = pages.limit(64).cache()
    warm_ex = extract_all_stage(warm_pages).persist()
    resolve_triples(
        triples_from(warm_ex), mentions_from(warm_ex), alias_dict(spark)
    ).count()
    warm_ex.unpersist()
    warm_pages.unpersist()

    print("== kg_pipeline sub-phases ==", flush=True)
    # 0. Arrow round-trip floor: identity pandas UDF over the same pages
    from pyspark.sql import functions as F, types as T

    def _ident(s: pd.Series) -> pd.Series:
        return s

    ident = F.pandas_udf(_ident, T.BinaryType())
    _timed(
        lambda: _noop(pages.select(ident(F.col("html")).alias("h"))),
        "arrow identity UDF over pages (noop)",
    )
    # 1. extraction alone (the Arrow UDF + struct conversion)
    spark.sparkContext.setJobDescription("phase: extract only")
    _timed(lambda: _noop(extract_all_stage(pages)), "extract_all (noop)")

    # 2. extraction + persist + count (what bench.py pays to materialize)
    def _extract_persist():
        ex = extract_all_stage(pages).persist()
        ex.count()
        ex.unpersist()

    _timed(_extract_persist, "extract_all persist+count")

    # 3. mentions explode + page_entity_links over a persisted extraction
    ex = extract_all_stage(pages).persist()
    ex.count()
    _timed(
        lambda: _noop(page_entity_links(mentions_from(ex), alias_dict(spark))),
        "page_entity_links (from persisted ex)",
    )
    _timed(
        lambda: _noop(triples_from(ex)), "triples_from explode (persisted ex)"
    )
    _timed(
        lambda: _noop(
            resolve_triples(triples_from(ex), mentions_from(ex), alias_dict(spark))
        ),
        "resolve_triples full (from persisted ex)",
    )

    # 4. end-to-end exactly as bench.py times it
    def _full():
        extracted = extract_all_stage(pages).persist()
        triples = resolve_triples(
            triples_from(extracted),
            mentions_from(extracted),
            alias_dict(spark),
        ).persist()
        triples.count()
        extracted.unpersist()
        triples.unpersist()

    _timed(_full, "kg_pipeline end-to-end (bench slice)")

    # canonicalize sub-phases over a persisted triple table
    from blarify_spark.plans.canonicalize import (
        build_entity_nodes,
        candidate_pairs,
        canonicalize,
        connected_components,
        lsh_bands,
    )

    extracted = extract_all_stage(pages).persist()
    triples = resolve_triples(
        triples_from(extracted), mentions_from(extracted), alias_dict(spark)
    ).persist()
    n = triples.count()
    print(f"== kg_canonicalize sub-phases (over {n} triples) ==", flush=True)

    raw_nodes = build_entity_nodes(triples).persist()
    print(f"  raw nodes: {raw_nodes.count()}")
    _timed(lambda: _noop(lsh_bands(raw_nodes)), "lsh_bands (noop)")
    _timed(lambda: _noop(candidate_pairs(raw_nodes)), "candidate_pairs (noop)")
    pairs = candidate_pairs(raw_nodes).persist()
    print(f"  pairs: {pairs.count()}")
    _timed(
        lambda: _noop(connected_components(raw_nodes, pairs)),
        "connected_components (pairs persisted)",
    )

    def _canon_full():
        nodes, edges, _m = canonicalize(triples)
        nodes.count()
        edges.count()

    _timed(_canon_full, "canonicalize end-to-end (bench slice)")
    spark.stop()


def cmd_plans(tag: str) -> None:
    from blarify_spark.operators.registry import all_queries

    spark = _get_spark()
    queries = all_queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name in HEADLINE:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"plans/r06/{name}_{tag}.txt", "w") as fh:
            fh.write(plan)
    # kg composite plans
    from blarify_spark import corpus
    from blarify_spark.plans.extract import (
        extract_all_stage,
        mentions_from,
        triples_from,
    )
    from blarify_spark.plans.linking import resolve_triples
    from blarify_spark.sources.alias import alias_dict
    from blarify_spark.sources.pages import pages_from_rows

    rows = corpus.generate_pages(256, facts_range=(2, 5), synth_entities=200)
    pages = pages_from_rows(spark, rows)
    ex = extract_all_stage(pages)
    resolved = resolve_triples(
        triples_from(ex), mentions_from(ex), alias_dict(spark)
    )
    with open(f"plans/r06/kg_pipeline_{tag}.txt", "w") as fh:
        fh.write(
            resolved._sc._jvm.PythonSQLUtils.explainString(
                resolved._jdf.queryExecution(), "formatted"
            )
        )
    print(f"plans written to plans/r06/*_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "phases"
    if cmd == "queries":
        cmd_queries()
    elif cmd == "plans":
        cmd_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    else:
        cmd_phases()
