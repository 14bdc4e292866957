#!/usr/bin/env python
"""Variance probe for the bench's kg_pipeline slice (guide §1/§7).

The end-to-end kg slice swings 2-3x (3.8-9.4 s) across reps at near-zero
steal while its isolated sub-phases are stable — so the variance lives in
the composed execution. This probe runs the exact bench slice N times in
one event-logged session and attributes each rep's wall time to:

  * per-job durations and the DRIVER GAPS between jobs (planning/GC/py)
  * per-stage task-metric sums: executor run, JVM GC, fetch wait,
    deserialize, result serialize — so a slow rep is attributable to
    executor compute vs GC vs scheduling dead time.

Usage: python probes/kg_variance.py [reps]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pandas as pd  # noqa: F401

LOG_DIR = "/tmp/kg_variance_logs"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 6


def main() -> None:
    shutil.rmtree(LOG_DIR, ignore_errors=True)
    os.makedirs(LOG_DIR, exist_ok=True)

    from blarify_spark.session import get_spark

    spark = get_spark(
        cores=CPUS,
        app_name="kg_variance",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{LOG_DIR}",
            "spark.eventLog.compress": "false",
        },
    )

    from blarify_spark import corpus
    from blarify_spark.plans.extract import (
        extract_all_stage,
        mentions_from,
        triples_from,
    )
    from blarify_spark.plans.linking import resolve_triples
    from blarify_spark.sources.alias import alias_dict
    from blarify_spark.sources.pages import pages_from_rows

    rows = corpus.generate_pages(12000, facts_range=(2, 5), synth_entities=2000)
    pages = pages_from_rows(spark, rows).repartition(CPUS * 4).cache()
    pages.count()

    # bench-identical steady-state warmup
    warm_pages = pages.limit(64).cache()
    warm_ex = extract_all_stage(warm_pages).persist()
    resolve_triples(
        triples_from(warm_ex), mentions_from(warm_ex), alias_dict(spark)
    ).count()
    warm_ex.unpersist()
    warm_pages.unpersist()

    walls = []
    for i in range(REPS):
        spark.sparkContext.setJobDescription(f"REP{i}")
        t0 = time.perf_counter()
        extracted = extract_all_stage(pages).persist()
        triples = resolve_triples(
            triples_from(extracted), mentions_from(extracted), alias_dict(spark)
        ).persist()
        triples.count()
        dt = time.perf_counter() - t0
        extracted.unpersist()
        triples.unpersist()
        walls.append(dt)
        print(f"rep {i}: {dt:.3f}s", flush=True)
        spark.sparkContext.setJobDescription(None)
        time.sleep(0.5)
    spark.stop()

    files = glob.glob(f"{LOG_DIR}/*/events*") + [
        f for f in glob.glob(f"{LOG_DIR}/*") if os.path.isfile(f)
    ]
    jobs: dict = {}
    stages: dict = {}
    smetrics: dict = defaultdict(lambda: defaultdict(float))
    for f in files:
        with open(f) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except ValueError:
                    continue
                ev = e.get("Event")
                if ev == "SparkListenerJobStart":
                    jobs[e["Job ID"]] = {
                        "desc": (e.get("Properties") or {}).get(
                            "spark.job.description", ""
                        ),
                        "t0": e["Submission Time"],
                        "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                    }
                elif ev == "SparkListenerJobEnd":
                    if e["Job ID"] in jobs:
                        jobs[e["Job ID"]]["t1"] = e["Completion Time"]
                elif ev == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"],
                        "sub": si.get("Submission Time"),
                        "done": si.get("Completion Time"),
                        "tasks": si["Number of Tasks"],
                    }
                elif ev == "SparkListenerTaskEnd":
                    sid = e["Stage ID"]
                    tm = e.get("Task Metrics") or {}
                    m = smetrics[sid]
                    m["run"] += tm.get("Executor Run Time", 0)
                    m["gc"] += tm.get("JVM GC Time", 0)
                    m["deser"] += tm.get("Executor Deserialize Time", 0)
                    m["rser"] += tm.get("Result Serialization Time", 0)
                    sr = tm.get("Shuffle Read Metrics") or {}
                    m["fetch"] += sr.get("Fetch Wait Time", 0)
                    m["n"] += 1

    by_rep: dict[str, list[int]] = defaultdict(list)
    for jid, j in jobs.items():
        if j.get("desc", "").startswith("REP"):
            by_rep[j["desc"]].append(jid)

    for rep in sorted(by_rep, key=lambda r: int(r[3:])):
        jids = sorted(by_rep[rep])
        print(f"\n==== {rep} (wall {walls[int(rep[3:])]:.3f}s) ====")
        prev_end = None
        for jid in jids:
            j = jobs[jid]
            gap = 0.0 if prev_end is None else (j["t0"] - prev_end) / 1000
            dur = (j.get("t1", j["t0"]) - j["t0"]) / 1000
            prev_end = j.get("t1")
            print(f" job {jid}: {dur:.3f}s  (gap before: {gap:.3f}s)")
            for sid in sorted(j["stages"]):
                s = stages.get(sid)
                if not s or not s.get("sub"):
                    continue
                m = smetrics.get(sid, {})
                print(
                    f"   stage {sid}: {(s['done'] - s['sub']) / 1000:.3f}s"
                    f" tasks={s['tasks']}"
                    f" run={m.get('run', 0) / 1000:.1f}s"
                    f" gc={m.get('gc', 0) / 1000:.1f}s"
                    f" fetch={m.get('fetch', 0) / 1000:.1f}s"
                    f" deser={m.get('deser', 0) / 1000:.1f}s"
                    f" {s['name'][:60]}"
                )


if __name__ == "__main__":
    main()
