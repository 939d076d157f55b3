#!/usr/bin/env python3
"""Isolated per-query medians — the regression-gate protocol for the
host-morphology-sensitive (many-small-job iterative) query families.

Full-session bench position confounds these queries: app-status/GC state
accumulated by hundreds of earlier queries inflates the most job-intensive
ones ~1.4x, and session composition swings q_ppr/q_dedup_clusters +/-40%
with untouched code (BASELINE.md, rounds 8-9). The honest number is the
median of N FRESH-JVM runs, each warming the query once (steady-state
codegen) and timing it once, with nothing else running on the host.

Usage:
  python3 tools/isolated_medians.py q_ppr,q_pagerank [sfdir] [n_runs]

Protocol requirements (bench-session hygiene):
  - run `sbt -batch compile` FIRST so no run pays compile cost;
  - do NOT run sbt/tests/benches concurrently (~30% inflation measured);
  - compare MEDIANS across rounds, never single runs.

Emits one line per run, one summary line per query, and a final JSON line
shaped for BASELINE.md pinning.
"""
import json
import os
import statistics
import subprocess
import sys


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    queries = [q for q in sys.argv[1].split(",") if q]
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    out = {}
    for q in queries:
        times = []
        for i in range(n_runs):
            env = dict(os.environ, SPARK_GRAFT_ONLY=q, SPARK_GRAFT_SF_DIR=sfdir,
                       SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"))
            p = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                               capture_output=True, text=True, env=env)
            t = None
            for line in p.stdout.splitlines():
                if '"metric":"total"' in line and '"n_queries"' in line:
                    d = json.loads(line.strip())
                    t = d["queries"].get(q)
            if t is None or t < 0:
                print(f"{q} run {i + 1}: FAILED (no timing parsed)", flush=True)
            else:
                times.append(t)
                print(f"{q} run {i + 1}: {t:.2f} s", flush=True)
        med = round(statistics.median(times), 2) if times else -1.0
        out[q] = med
        print(f"{q}: median={med} over {len(times)} isolated runs "
              f"[{', '.join(f'{t:.2f}' for t in sorted(times))}]", flush=True)
    print(json.dumps({"metric": "isolated_medians", "sf": sfdir,
                      "runs": n_runs, "queries": out}))


if __name__ == "__main__":
    main()
