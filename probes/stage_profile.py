#!/usr/bin/env python
"""Per-stage timeline profiler (guide §1/§7): runs a target with Spark
event logging on, then prints each timed job's stages with durations,
task counts and gaps — the UI's stage view, reconstructed headlessly.

Usage:
    python probes/stage_profile.py dedup_minhash_lsh dedup_ngram_jaccard
    python probes/stage_profile.py kg_pipeline      # composite slice
    python probes/stage_profile.py kg_canonicalize
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pandas as pd  # noqa: F401  (bench parity: module-level import)

LOG_DIR = "/tmp/stage_profile_logs"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    targets = sys.argv[1:] or ["dedup_minhash_lsh"]
    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR, exist_ok=True)

    from blarify_spark.session import get_spark

    spark = get_spark(
        cores=CPUS,
        app_name="stage_profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{LOG_DIR}",
            "spark.eventLog.compress": "false",
        },
    )
    spark.read.parquet(f"{SF}/documents.parquet").count()

    from blarify_spark.operators.registry import all_queries

    queries = all_queries()

    kg_state: dict = {}

    def _kg_setup():
        from blarify_spark import corpus
        from blarify_spark.plans.extract import (
            extract_all_stage,
            mentions_from,
            triples_from,
        )
        from blarify_spark.plans.linking import resolve_triples
        from blarify_spark.sources.alias import alias_dict
        from blarify_spark.sources.pages import pages_from_rows

        if "pages" not in kg_state:
            rows = corpus.generate_pages(
                12000, facts_range=(2, 5), synth_entities=2000
            )
            kg_state["pages"] = (
                pages_from_rows(spark, rows).repartition(CPUS * 4).cache()
            )
            kg_state["pages"].count()
        kg_state["mods"] = (
            extract_all_stage,
            mentions_from,
            triples_from,
            resolve_triples,
            alias_dict,
        )

    def run_target(name: str) -> None:
        if name == "kg_pipeline":
            _kg_setup()
            ex_st, m_from, t_from, resolve, adict = kg_state["mods"]
            extracted = ex_st(kg_state["pages"]).persist()
            triples = resolve(
                t_from(extracted), m_from(extracted), adict(spark)
            ).persist()
            triples.count()
            extracted.unpersist()
            triples.unpersist()
        elif name == "kg_canonicalize":
            _kg_setup()
            ex_st, m_from, t_from, resolve, adict = kg_state["mods"]
            from blarify_spark.plans.canonicalize import canonicalize

            if "triples" not in kg_state:
                extracted = ex_st(kg_state["pages"]).persist()
                kg_state["triples"] = resolve(
                    t_from(extracted), m_from(extracted), adict(spark)
                ).persist()
                kg_state["triples"].count()
            nodes, edges, _ = canonicalize(kg_state["triples"])
            nodes.count()
            edges.count()
        else:
            _noop(queries[name](spark, SF))

    # warm pass (codegen, scans), then timed pass
    for name in targets:
        run_target(name)
    time.sleep(1)
    for name in targets:
        spark.sparkContext.setJobDescription(f"TIMED::{name}")
        t0 = time.perf_counter()
        run_target(name)
        print(f"{name}: {time.perf_counter() - t0:.3f}s total", flush=True)
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # ---- parse event log ----
    files = glob.glob(f"{LOG_DIR}/*/events*") + [
        f for f in glob.glob(f"{LOG_DIR}/*") if os.path.isfile(f)
    ]
    evs = []
    for f in files:
        with open(f) as fh:
            for line in fh:
                try:
                    evs.append(json.loads(line))
                except ValueError:
                    pass
    jobs: dict = {}
    stages: dict = {}
    for e in evs:
        if e["Event"] == "SparkListenerJobStart":
            jobs[e["Job ID"]] = {
                "desc": (e.get("Properties") or {}).get(
                    "spark.job.description", ""
                ),
                "t0": e["Submission Time"],
                "stages": [s["Stage ID"] for s in e["Stage Infos"]],
            }
        elif e["Event"] == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["t1"] = e["Completion Time"]
        elif e["Event"] == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"],
                "sub": si.get("Submission Time"),
                "done": si.get("Completion Time"),
                "tasks": si["Number of Tasks"],
            }
    prev_end = None
    for jid, j in sorted(jobs.items()):
        if "TIMED" not in j.get("desc", ""):
            prev_end = j.get("t1", prev_end)
            continue
        gap = (
            ""
            if prev_end is None
            else f"  [+{(j['t0'] - prev_end) / 1000:.3f}s gap before]"
        )
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000
        print(f"\njob {jid} [{j['desc'][:40]}] {dur:.3f}s{gap}")
        prev_end = j.get("t1")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if s and s.get("sub"):
                print(
                    f"  stage {sid}: {(s['done'] - s['sub']) / 1000:.3f}s "
                    f"tasks={s['tasks']} {s['name'][:90]}"
                )


if __name__ == "__main__":
    main()
