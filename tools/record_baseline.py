#!/usr/bin/env python3
"""Record BENCH_BASELINE.json as the per-query MEDIAN of N full Bench
runs (default 3, fresh JVM each).

Why medians: a single prewarmed pass still carries 2-3x run-to-run
swing on the iterative graph family (per-round checkpoint jobs, GC,
scheduler jitter) — a baseline drawn from one lucky-fast run makes
bench_guard flag pure variance as regression (r10: six 2.0-2.7x flags
on sub-3s graph queries, host factor 1.01, none reproducible in
isolation). The median of three runs is a TYPICAL value per query, so
a guard flag against it means the query moved against its own typical
behavior, not that the dice rolled differently.

The merged file keeps Bench's JSON shape (bench_guard reads `queries`)
with protocol "prewarmed-median-of-N" and a `runs_total_sec` provenance
field carrying each contributing run's total.

Usage: tools/record_baseline.py [N]
"""
import json
import os
import pathlib
import statistics
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def one_run(i: int) -> dict:
    out = f"/tmp/baseline_run_{i}.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_REPEAT="1",
        SPARK_GRAFT_BENCH_OUT=out,
    )
    subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, check=True,
        stdout=sys.stderr, stderr=subprocess.DEVNULL,
    )
    return json.loads(pathlib.Path(out).read_text())


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs = [one_run(i) for i in range(n)]
    names = set.intersection(*(set(r["queries"]) for r in runs))
    failed = sorted(q for r in runs for q, s in r["queries"].items()
                    if s < 0)
    if failed:
        print(f"REFUSING to record: failed queries {failed}")
        return 1
    queries = {q: statistics.median(r["queries"][q] for r in runs)
               for q in sorted(names)}
    total = sum(queries.values())
    merged = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "protocol": f"prewarmed-median-of-{n}",
        "steady_total": total,
        "queries": queries,
        "queries_steady": queries,
        "errors": [],
        "error_msgs": {},
        "runs_total_sec": [round(r["value"], 3) for r in runs],
        "storage_mem_bytes": max(r.get("storage_mem_bytes", 0)
                                 for r in runs),
        "sf": runs[0]["sf"],
    }
    out = REPO / "BENCH_BASELINE.json"
    out.write_text(json.dumps(merged))
    print(f"wrote {out}: total {total:.1f}s over {len(queries)} queries "
          f"(run totals: {merged['runs_total_sec']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
