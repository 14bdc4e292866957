#!/usr/bin/env python
"""Full-registry correctness sweep (VERDICT r05 'Next round' #3).

Runs EVERY registered query at sf0.01, collects the output, checksums
the sorted rows, and audits the executed physical plan (Exchange count,
Python-eval nodes, join strategies). Running it against two trees and
diffing the checksums proves round-over-round output equality for the
whole registry — including the 44 rows-only queries the driver prefix
cannot cover.

Usage:
    PYTHONPATH=<tree-root> python probes/registry_sweep.py out.json
    python probes/registry_sweep.py --diff a.json b.json   # compare md5s

Checksum recipe: rows -> tuples -> sorted -> one repr per row ->
md5 of newline-joined lines. Rows with NULL sort keys (cube/rollup/
grouping-sets) are unsortable as tuples; those sort by repr instead and
the entry is marked nullsafe — identical recipe on both trees, so
equality still means bit-equal outputs.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import pandas as pd  # noqa: F401

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def _checksum(rows) -> tuple[str, bool]:
    tups = [tuple(r) for r in rows]
    nullsafe = False
    try:
        tups.sort()
    except TypeError:
        tups.sort(key=repr)
        nullsafe = True
    digest = hashlib.md5(
        "\n".join(repr(t) for t in tups).encode()
    ).hexdigest()
    return digest, nullsafe


def _plan_audit(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": plan.count("Exchange"),
        "py_eval": plan.count("EvalPython") + plan.count("MapInPandas")
        + plan.count("MapInArrow"),
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
    }


def sweep(out_path: str) -> None:
    from blarify_spark.session import get_spark
    from blarify_spark.operators.registry import all_oracles, all_queries

    spark = get_spark(cores=CPUS, app_name="registry_sweep")
    queries = all_queries()
    oracles = all_oracles()
    out: dict = {}
    for i, (name, fn) in enumerate(sorted(queries.items())):
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            df = fn(spark, SF)
            rows = df.collect()
            md5, nullsafe = _checksum(rows)
            entry = {
                "rows": len(rows),
                "md5": md5,
                "oracled": oracles.get(name) is not None,
                "plan": _plan_audit(df),
            }
            if nullsafe:
                entry["nullsafe"] = True
            out[name] = entry
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        print(f"[{i + 1}/{len(queries)}] {name}: "
              f"{out[name].get('rows', out[name].get('error'))}", flush=True)
    spark.stop()
    out["_meta"] = {
        "sf": SF.rstrip("/").split("sf")[-1],
        "queries_total": len(queries),
        "recipe": "sorted row tuples -> repr lines -> md5; nullsafe "
        "entries sort by repr (NULL grouping keys)",
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print("wrote", out_path)


def diff(a_path: str, b_path: str) -> int:
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    names = sorted((set(a) | set(b)) - {"_meta"})
    bad = 0
    for n in names:
        ea, eb = a.get(n), b.get(n)
        if ea is None or eb is None:
            print(f"MISSING {n}: a={ea is not None} b={eb is not None}")
            bad += 1
        elif ea.get("md5") != eb.get("md5") or ea.get("rows") != eb.get("rows"):
            print(f"DIFF {n}: a={ea.get('rows')}/{ea.get('md5')} "
                  f"b={eb.get('rows')}/{eb.get('md5')}")
            bad += 1
    print(f"{len(names) - bad}/{len(names)} queries identical")
    return bad


if __name__ == "__main__":
    if sys.argv[1] == "--diff":
        sys.exit(1 if diff(sys.argv[2], sys.argv[3]) else 0)
    sweep(sys.argv[1])
