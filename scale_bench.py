#!/usr/bin/env python
"""N-vs-4N scaling evidence for the north rule (BASELINE.json).

Runs the identical KG-pipeline job at local[N] and local[4N] on the same
input (fresh JVM per run via subprocess, so nothing is shared) and
reports throughput at both plus scaling efficiency

    eff = (throughput_4N / throughput_N) / 4

The north rule requires eff >= 0.8. Results are appended to BENCH notes
in BASELINE.md by the round workflow.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "8"))
PAGES = os.environ.get("SPARK_GRAFT_KG_PAGES", "8000")


def run_once(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_KG_PAGES=PAGES,
        SPARK_GRAFT_BENCH_KG_ONLY="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    lo = run_once(N)
    hi = run_once(4 * N)
    tp_lo = lo["kg_triples_per_sec"]
    tp_hi = hi["kg_triples_per_sec"]
    eff = (tp_hi / tp_lo) / 4
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "n_cores": N,
                "throughput_n": tp_lo,
                "n4_cores": 4 * N,
                "throughput_4n": tp_hi,
                "kg_pages": int(PAGES),
                "pass_north_rule": eff >= 0.8,
            }
        )
    )


if __name__ == "__main__":
    main()
