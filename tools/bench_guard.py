#!/usr/bin/env python3
"""Per-query bench regression guard.

Compares a Bench run's per-query seconds against the checked-in
baseline (BENCH_BASELINE.json). PROTOCOL (VERDICT r7 #1, amended r10):
both sides are PREWARMED single-pass — Bench runs every query once
untimed first (absorbing the JIT/codegen ramp that made early
alphabetical queries read as fake 6-9x regressions in driver runs),
then times one pass; the baseline is the per-query MEDIAN of three
such runs (tools/record_baseline.py — fresh JVM each, same protocol
the driver uses) — so the 2x gate compares a run against TYPICAL
per-query behavior. The r7 headline read 2.5x purely because a warm
min-of-3 baseline was compared against a cold driver pass; the r9
flag list was phantom cold-ramp asymmetry; the r10 single-run baseline
flagged six 2.0-2.7x pure-variance excursions on iterative graph
queries, which the median absorbs. Without per-query baselines, machine noise and real regressions
are indistinguishable — round 4's driver run showed the same plan at
3.3s (builder) and 17.2s (driver, cold cache/contention); this guard
is the tie-breaker you re-run locally.

Usage:
  tools/bench_guard.py              # run Bench (prewarmed-median-of-3, sf0.1), compare
  tools/bench_guard.py RESULT.json  # compare an existing Bench output file

Protocols must MATCH (r11): the baseline file and the compared run
must carry the same `protocol` string, otherwise this guard refuses —
a median-of-3 run read against a single-pass baseline measures the
protocol difference, not the code.

A query regresses when it is BOTH >2x its HOST-NORMALIZED baseline AND
>0.5s absolute over it. Host normalization: the median cur/base ratio
over all matched queries (>=0.2s baselines) estimates how loaded the
machine is relative to when the baseline was recorded — a contended
run slows EVERY query together (observed +35% fleet-wide on this box),
and without the factor that reads as dozens of 1.3x "regressions" or,
for cache-fast sub-second queries, spurious 2-3x ones. A real
regression moves ONE query against the fleet. The absolute floor keeps
60ms queries from flagging on scheduler jitter. New queries (no
baseline) are listed informationally and never fail the run. Exit 1
iff any regression is flagged.
"""
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
BASELINE = REPO / "BENCH_BASELINE.json"
RATIO = 2.0
ABS_FLOOR_SEC = 0.5
# hard per-query bound (VERDICT r8 #6): no query may exceed 3x its
# baseline at matched host factor — and the factor credited to the
# host is CAPPED at the 1.5x sanity bound, so a heavily loaded run
# cannot normalize away a dedup_cc-style single-query excursion (r8:
# 3.9x raw read as "host sensitivity" and only surfaced in the
# verdict; this makes it exit non-zero)
HARD_RATIO = 3.0
FACTOR_CAP = 1.5


def run_bench() -> dict:
    out = "/tmp/bench_guard_result.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_BENCH_OUT=out,
    )
    # default protocol (prewarmed-median-of-3) unless the caller
    # explicitly overrides — must match how the baseline was recorded
    env.pop("SPARK_GRAFT_ONLY", None)
    subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=REPO, env=env, check=True,
        stdout=sys.stderr, stderr=subprocess.DEVNULL,
    )
    return json.loads(pathlib.Path(out).read_text())


def main() -> int:
    baseline = json.loads(BASELINE.read_text())
    base = baseline["queries"]
    result = (
        json.loads(pathlib.Path(sys.argv[1]).read_text())
        if len(sys.argv) > 1
        else run_bench()
    )
    cur = result["queries"]
    # like protocols only (VERDICT r10 #1): a median-of-3 run compared
    # against a single-pass baseline (or vice versa) reports protocol,
    # not code — refuse rather than emit an untrustworthy flag list
    bp, rp = baseline.get("protocol"), result.get("protocol")
    if bp != rp:
        print(f"REFUSING to compare: result protocol {rp!r} != baseline "
              f"protocol {bp!r} — re-record the baseline "
              "(tools/record_baseline.py) or re-run Bench with matching "
              "SPARK_GRAFT_REPEAT/SPARK_GRAFT_PREPASS")
        return 1
    # like ENVIRONMENTS only (VERDICT r13 #1): streaming state-store
    # fixed cost scales with partition count (stream_join_feed 2.25s
    # @4 cpus vs 6.34s @32 — same JVM, code, data), so a cpus- or
    # partitions-mismatched comparison measures the environment, not
    # the code; five rounds of feed false-flags came from exactly this.
    for field in ("cpus", "shuffle_partitions", "master", "state_store"):
        bv, rv = baseline.get(field), result.get(field)
        if bv is not None and rv is not None and bv != rv:
            print(f"REFUSING to compare: result {field}={rv!r} != "
                  f"baseline {field}={bv!r} — re-run Bench with "
                  f"SPARK_GRAFT_CPUS={bv} or re-record the baseline "
                  "under the environment you mean to gate")
            return 1
        if bv is None:
            print(f"WARNING: baseline does not record {field!r} — "
                  "environment match unverifiable; re-record the "
                  "baseline (tools/record_baseline.py) to pin it")

    # host-speed factor: median cur/base ratio over stable baselines
    ratios = sorted(
        cur[n] / b for n, b in base.items()
        if b >= 0.2 and cur.get(n, -1) >= 0)
    factor = max(1.0, ratios[len(ratios) // 2]) if ratios else 1.0
    if factor > 1.5:
        # a genuine fleet-wide regression (e.g. a global Spark config
        # change slowing everything) is indistinguishable from host
        # load here — the median ratio absorbs it and would report
        # zero regressions. Don't trust the normalized verdict blind.
        print(f"WARNING: host factor {factor:.2f}x exceeds the 1.5x "
              "sanity bound — either this machine is heavily loaded or "
              "EVERY query regressed together (a global config/plan "
              "change). Confirm host load externally before trusting "
              "the normalized verdict.")

    regressions, new = [], []
    for name, sec in sorted(cur.items()):
        if sec < 0:  # Bench records time-to-failure as negative
            regressions.append((name, sec, base.get(name), "FAILED"))
            continue
        b = base.get(name)
        if b is None:
            new.append((name, sec))
        elif (sec > b * min(factor, FACTOR_CAP) * HARD_RATIO
              and sec > b + ABS_FLOOR_SEC):
            regressions.append(
                (name, sec, b,
                 f"HARD >{HARD_RATIO:.0f}x: {sec / b:.1f}x raw, "
                 f"{sec / (b * factor):.1f}x host-adjusted"))
        elif sec > b * factor * RATIO and sec > b + ABS_FLOOR_SEC:
            regressions.append(
                (name, sec, b, f"{sec / b:.1f}x raw, {sec / (b * factor):.1f}x host-adjusted"))

    for name, sec in new:
        print(f"new     {name}: {sec:.2f}s (no baseline — re-record)")
    for name, sec, b, why in regressions:
        base_s = f"{b:.2f}s" if b is not None else "none"
        print(f"REGRESS {name}: {sec:.2f}s vs baseline {base_s} ({why})")
    total = sum(s for s in cur.values() if s >= 0)
    print(f"{len(cur)} queries, total {total:.1f}s, "
          f"host factor {factor:.2f}x vs baseline — "
          f"{len(regressions)} regression(s), {len(new)} new")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
