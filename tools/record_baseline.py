#!/usr/bin/env python3
"""Record BENCH_BASELINE.json from N full Bench runs (default 1,
fresh JVM each; per-query median-of-medians when N>1).

Since r11 Bench itself times each query REPEAT (default 3) times
back-to-back and reports the per-query MEDIAN, so a single recording
run already carries the same variance control a driver run does —
the baseline and every BENCH_r{N} are then the SAME protocol string
and bench_guard compares like with like. Extra fresh-JVM runs (N>1)
additionally absorb cross-run state (page cache, CPU frequency), at
~15 min per run.

Why medians at all: a single prewarmed pass carries 2-3x run-to-run
swing on the iterative graph family (per-round checkpoint jobs, GC,
scheduler jitter) — a baseline drawn from one lucky-fast pass makes
bench_guard flag pure variance as regression (r10: ~19 of 25 flags
were protocol artifacts). A guard flag against a median means the
query moved against its own typical behavior.

The merged file keeps Bench's JSON shape (bench_guard reads `queries`
and asserts `protocol` equality) with a `runs_total_sec` provenance
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
        SPARK_GRAFT_BENCH_OUT=out,
    )
    # a profiling restriction leaking in from the shell would silently
    # shrink the baseline's query set (ADVICE r10) — children always
    # run the full registry under the default protocol
    for k in ("SPARK_GRAFT_ONLY", "SPARK_GRAFT_PREPASS",
              "SPARK_GRAFT_REPEAT"):
        env.pop(k, None)
    subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, check=True,
        stdout=sys.stderr, stderr=subprocess.DEVNULL,
    )
    return json.loads(pathlib.Path(out).read_text())


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    runs = [one_run(i) for i in range(n)]
    # identical query sets or refuse (ADVICE r10): intersection would
    # silently drop a query missing from one run and bench_guard would
    # treat it as "new, informational" forever
    sets = [set(r["queries"]) for r in runs]
    union, inter = set.union(*sets), set.intersection(*sets)
    if union != inter:
        print(f"REFUSING to record: runs disagree on the query set — "
              f"symmetric difference {sorted(union - inter)}")
        return 1
    protocols = {r.get("protocol") for r in runs}
    if len(protocols) != 1:
        print(f"REFUSING to record: mixed protocols {sorted(protocols)}")
        return 1
    # one environment per baseline (VERDICT r13 #1): cpus/partitions
    # change streaming fixed costs 2-3x, so a baseline mixing them is
    # not a baseline of anything
    for field in ("cpus", "shuffle_partitions", "master", "state_store"):
        vals = {r.get(field) for r in runs}
        if len(vals) != 1:
            print(f"REFUSING to record: mixed {field} {sorted(map(str, vals))}")
            return 1
    failed = sorted(q for r in runs for q, s in r["queries"].items()
                    if s < 0)
    if failed:
        print(f"REFUSING to record: failed queries {failed}")
        return 1
    queries = {q: statistics.median(r["queries"][q] for r in runs)
               for q in sorted(inter)}
    total = sum(queries.values())
    merged = {
        "metric": "total",
        "value": total,
        "unit": "sec",
        "protocol": runs[0]["protocol"],
        # execution environment, pinned (VERDICT r13 #1) — bench_guard
        # refuses a comparison when these differ from the compared run
        "cpus": runs[0].get("cpus"),
        "shuffle_partitions": runs[0].get("shuffle_partitions"),
        "master": runs[0].get("master"),
        "state_store": runs[0].get("state_store"),
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
