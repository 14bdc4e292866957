#!/usr/bin/env python
"""Same-window A/B of kg_pipeline across round binaries (VERDICT r03 #4).

BENCH_r03 showed kg_pipeline 5.82 -> 6.42 s vs round 2 while the
extract+link path was byte-unchanged — plausibly host drift, but the
artifact couldn't show it. This probe interleaves the round binaries
(checked out as git worktrees) within ONE measurement window, N reps
each, recording per-run steal, so binary effects separate from host
drift. Run from the repo root:

    python probes/ab_kg_pipeline.py /tmp/wt_r2 /tmp/wt_r3 .

Each arm invokes that binary's own bench.py with
SPARK_GRAFT_BENCH_KG_ONLY=1 SPARK_GRAFT_BENCH_SKIP_CANON=1 (flags exist
in all rounds' bench.py) and identical corpus knobs.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPS = int(os.environ.get("AB_REPS", "3"))


def run_arm(path: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_KG_ONLY="1",
        SPARK_GRAFT_BENCH_SKIP_CANON="1",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=path,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    return {
        "kg_pipeline": rec["queries"]["kg_pipeline"],
        "kg_steal_pct": rec.get("kg_steal_pct"),
        "kg_triples": rec.get("kg_triples"),
        "throughput": rec.get("kg_triples_per_sec"),
    }


def main() -> None:
    arms = {os.path.basename(os.path.abspath(a)) or a: a for a in sys.argv[1:]}
    results: dict[str, list[dict]] = {k: [] for k in arms}
    for rep in range(REPS):
        for name, path in arms.items():  # interleaved: same window per rep
            r = run_arm(path)
            results[name].append(r)
            print(f"rep{rep} {name}: {r}", flush=True)
    summary = {
        name: {
            "runs": rs,
            "median_sec": statistics.median(r["kg_pipeline"] for r in rs),
            "best_sec": min(r["kg_pipeline"] for r in rs),
            "max_steal_pct": max(
                (r["kg_steal_pct"] or 0) for r in rs
            ),
        }
        for name, rs in results.items()
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
