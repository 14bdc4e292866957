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


# A rep run with machine-wide steal above this is retried (up to
# AB_RETRIES extra times) — a periodic external load otherwise
# contaminates whichever arm its phase lands on.
CALM_PCT = float(os.environ.get("AB_CALM_PCT", "1.0"))
RETRIES = int(os.environ.get("AB_RETRIES", "2"))


def main() -> None:
    arms = {os.path.basename(os.path.abspath(a)) or a: a for a in sys.argv[1:]}
    names = list(arms)
    results: dict[str, list[dict]] = {k: [] for k in arms}
    for rep in range(REPS):
        # rotate the arm order each rep: a fixed order lets any periodic
        # host load bias a fixed slot (observed round-5: the 3rd-slot arm
        # caught the steal spike in all three reps)
        order = names[rep % len(names) :] + names[: rep % len(names)]
        for name in order:
            for attempt in range(1 + RETRIES):
                r = run_arm(arms[name])
                if (r.get("kg_steal_pct") or 0.0) <= CALM_PCT:
                    break
            r["retries"] = attempt
            results[name].append(r)
            print(f"rep{rep} {name}: {r}", flush=True)
    summary = {
        name: {
            "runs": rs,
            "median_sec": statistics.median(r["kg_pipeline"] for r in rs),
            "best_sec": min(r["kg_pipeline"] for r in rs),
            "best_calm_sec": min(
                (
                    r["kg_pipeline"]
                    for r in rs
                    if (r["kg_steal_pct"] or 99) <= CALM_PCT
                ),
                default=None,
            ),
            "max_steal_pct": max(
                (r["kg_steal_pct"] or 0) for r in rs
            ),
        }
        for name, rs in results.items()
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
