#!/usr/bin/env python3
"""Parallel, hard-timeout front-end for the DuckDB oracle compare —
the big-scale-leg companion to oracle_check.py (which stays the
faithful serial mimic of the driver's single-connection gate).

Why it exists (r11, sf1 leg): DuckDB's `interrupt()` is only honored
between pipeline tasks, so a quadratic oracle inside ONE monster
hash-join/recursive-CTE iteration overruns a threading.Timer by tens
of minutes (observed: dedup_cc_star 25 min past a 600 s timer). At
sf >= 1 the only reliable per-query ceiling is a process boundary:
each oracle runs in its own subprocess (fresh connection, its own
allocator, its own mmap budget) and is SIGKILLed at the wall —
recorded as `oracle_timeout`, the same checker-limitation verdict
oracle_check records, never a FAIL. W workers cut the wall clock of
the ~340-oracle run by ~W.

The per-query compare is oracle_check's, bit for bit: sorted-column
multiset compare with python-type tags, pandas-dtype drift check, the
same result-row schema and artifact shape (plus `protocol:
"parallel-hard-timeout"` so artifacts are distinguishable).

Big-SF spill protocol, automated (VERDICT r13 #5 — previously a
manual NOTES.md recipe): at sf >= 1 the quadratic dedup oracles spill
tens of GB per worker and 4-6 concurrent workers can exhaust local
disk ("No space left on device" — a genuine FAIL, not checker-
limited). Three pieces, all on by default:
  1. DISK PREFLIGHT: workers are clamped so workers x per-worker
     spill budget fits in the spill volume's free space, never below
     1. Budget is --spill-per-worker-gb when given, else size-scaled:
     min(64, max(1, 100 x sfDir GB)) — 64 is DuckDB's
     max_temp_directory_size cap (fresh_con), 100x is the observed
     worst-case spill/input ratio of the quadratic dedup oracles.
  2. SERIAL RETRY: after the parallel pass, every disk/OOM/timeout
     failure is re-run SERIALLY with ORACLE_MEMORY_LIMIT raised
     (--retry-memory, default 24GB — more memory = drastically less
     spill) and a doubled wall budget.
  3. MERGE: the passes are folded with tools/merge_correctness.py
     semantics — a retry `ok` upgrades a pass-1 failure; a retry that
     itself hits a checker wall never downgrades anything.
Disable with --no-retry (pass 1 only, r12 behavior).

Usage:
  tools/oracle_par.py <sfDir> <verifyOutDir> [artifact.json]
      [--workers=6] [--timeout=600] [--retry-memory=24GB]
      [--spill-per-worker-gb=64] [--no-retry]
  tools/oracle_par.py --one <sfDir> <verifyOutDir> <name> <resultFile>
      (internal: run exactly one oracle and write its result row)
"""
import glob
import json
import os
import pathlib
import signal
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
import oracle_check  # noqa: E402  (fresh_con, rows_key, apply_sets)


def check_one(sf_dir: str, out_dir: str, name: str) -> dict:
    with open(f"{out_dir}/oracle_sql.json") as f:
        sql = json.load(f)[name]
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return {"ok": False, "err": "no spark parquet output",
                "phase": "engine_output"}
    con = oracle_check.fresh_con(sf_dir)
    # Phase tags (ADVICE r11): an OOM while reading the ENGINE's own
    # parquet output is an engine-adjacent failure; an OOM inside the
    # oracle SQL is a checker limitation. Tag which phase raised so
    # merge_correctness can classify OOMs honestly instead of blanket-
    # excusing every "Out of Memory" as checker-limited.
    try:
        spark_rel = con.execute(f"SELECT * FROM read_parquet({files!r})")
        spark_cols = [c[0] for c in spark_rel.description]
        spark_rows = spark_rel.fetchall()
    except Exception as e:
        return {"ok": False, "err": f"{type(e).__name__}: {e}",
                "phase": "engine_output"}
    try:
        duck_rel = con.execute(sql)
        duck_cols = [c[0] for c in duck_rel.description]
        duck_rows = duck_rel.fetchall()
    except Exception as e:
        return {"ok": False, "err": f"{type(e).__name__}: {e}",
                "phase": "oracle"}
    if sorted(spark_cols) != sorted(duck_cols):
        return {"ok": False,
                "err": f"columns {sorted(spark_cols)} != {sorted(duck_cols)}"}
    s_ix = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    d_ix = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
    srows = [[r[i] for i in s_ix] for r in spark_rows]
    drows = [[r[i] for i in d_ix] for r in duck_rows]
    if len(srows) != len(drows):
        return {"ok": False,
                "err": f"rowcount spark={len(srows)} duck={len(drows)}"}
    # pandas-dtype drift (driver compares .df() frames — see oracle_check).
    # Two try blocks (ADVICE r12): a failure re-reading the ENGINE's own
    # parquet must tag phase 'engine_output' — wrapping both re-executions
    # in one 'oracle'-tagged block would let merge_correctness classify an
    # engine-output OOM as checker-limited, the exact misclassification
    # the phase tags exist to prevent.
    try:
        sdt = con.execute(f"SELECT * FROM read_parquet({files!r})").df().dtypes
    except Exception as e:
        return {"ok": False, "err": f"dtype check: {type(e).__name__}: {e}",
                "phase": "engine_output"}
    try:
        ddt = con.execute(sql).df().dtypes
    except Exception as e:
        return {"ok": False, "err": f"dtype check: {type(e).__name__}: {e}",
                "phase": "oracle"}
    s_dt = {c: str(t) for c, t in sdt.items()}
    d_dt = {c: str(t) for c, t in ddt.items()}
    drift = {c: (s_dt[c], d_dt[c])
             for c in s_dt if c in d_dt and s_dt[c] != d_dt[c]}
    if drift:
        return {"ok": False, "err": f"pandas dtype drift {drift}"}
    sk, dk = oracle_check.rows_key(srows), oracle_check.rows_key(drows)
    if sk != dk:
        diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:1]
        return {"ok": False, "err": "value mismatch",
                "first_diff": [repr(d) for d in diffs]}
    return {"ok": True, "rows": len(srows)}


def run_one(sf_dir: str, out_dir: str, name: str, result_file: str) -> int:
    try:
        res = check_one(sf_dir, out_dir, name)
    except Exception as e:  # a worker crash is a FAIL row, not a hang
        res = {"ok": False, "err": f"{type(e).__name__}: {e}"}
    pathlib.Path(result_file).write_text(json.dumps(res))
    return 0


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(a[2:].split("=", 1) if "=" in a else (a[2:], "1")
                for a in sys.argv[1:] if a.startswith("--"))
    if "one" in opts:
        return run_one(*argv)
    sf_dir, out_dir = argv[0], argv[1]
    artifact = argv[2] if len(argv) > 2 else None
    workers = int(opts.get("workers", "6"))
    t_limit = float(opts.get("timeout",
                             os.environ.get("ORACLE_TIMEOUT_SEC", "600")))
    retry = "no-retry" not in opts
    retry_mem = opts.get("retry-memory", "24GB")
    with open(f"{out_dir}/oracle_sql.json") as f:
        names = sorted(json.load(f))
    res_dir = pathlib.Path(out_dir) / "_oracle_par"
    res_dir.mkdir(exist_ok=True)

    # disk preflight: each worker may spill up to max_temp_directory_size
    # (fresh_con sets 64GB) onto the same volume — clamp concurrency so
    # the worst case fits in what's actually free, instead of letting
    # ENOSPC manufacture genuine-looking FAILs mid-pass (NOTES.md r13).
    # Per-worker budget defaults to size-scaled, not the flat 64 GB cap:
    # the quadratic dedup oracles spill ~100× the input corpus at sf>=1
    # (tens of GB at sf1's 222 MB) but megabytes at sf0.01 — a flat cap
    # would serialize every small-SF run on a 64 GB-free volume for no
    # protection gained.
    if "spill-per-worker-gb" in opts:
        spill_gb = float(opts["spill-per-worker-gb"])
    else:
        in_gb = sum(f.stat().st_size
                    for f in pathlib.Path(sf_dir).glob("*.parquet")) / 2**30
        spill_gb = min(64.0, max(1.0, 100.0 * in_gb))
    spill_dir = os.environ.get("TMPDIR", "/tmp")
    free_gb = os.statvfs(spill_dir).f_bavail * os.statvfs(spill_dir).f_frsize / 2**30
    max_workers = max(1, int(free_gb // spill_gb))
    if workers > max_workers:
        print(f"preflight: {free_gb:.0f} GB free on {spill_dir}, "
              f"{spill_gb:.0f} GB spill budget/worker — clamping workers "
              f"{workers} -> {max_workers}", flush=True)
        workers = max_workers

    def run_set(run_names, n_workers, wall, env, label):
        pending = list(run_names)
        running = {}  # name -> (Popen, deadline, result_file)
        results = {}

        def reap(block: bool):
            for name in list(running):
                p, deadline, rf = running[name]
                rc = p.poll()
                if rc is None and time.monotonic() > deadline:
                    p.send_signal(signal.SIGKILL)
                    p.wait()
                    results[name] = {"ok": False, "err": "oracle_timeout"}
                    print(f"TIMEOUT {name}: hard-killed at {wall:.0f}s"
                          f" [{label}]", flush=True)
                    del running[name]
                elif rc is not None:
                    try:
                        results[name] = json.loads(
                            pathlib.Path(rf).read_text())
                    except Exception:
                        results[name] = {"ok": False,
                                         "err": f"worker exit {rc}, no result"}
                    r = results[name]
                    tag = ("ok  " if r.get("ok")
                           else "FAIL" if r.get("err") != "oracle_timeout"
                           else "TIMEOUT")
                    detail = (f"({r['rows']} rows)" if r.get("ok")
                              else r.get("err", ""))
                    print(f"{tag} {name} {detail}", flush=True)
                    del running[name]
            if block and running:
                time.sleep(0.2)

        while pending or running:
            while pending and len(running) < n_workers:
                name = pending.pop(0)
                rf = str(res_dir / f"{name}.json")
                p = subprocess.Popen(
                    [sys.executable, __file__, "--one", sf_dir, out_dir,
                     name, rf],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                    env=env)
                # 3x wall budget (ADVICE r11): oracle_check grants 1x
                # for the first execution plus an explicit 2x for the
                # dtype re-execution; a single 1x deadline here would
                # SIGKILL a query that legitimately finishes its first
                # pass near the wall, diverging from the claimed
                # bit-for-bit mimic.
                running[name] = (p, time.monotonic() + 3 * wall, rf)
            reap(block=True)
        return results

    results = run_set(names, workers, t_limit, None, "parallel")

    # serial raised-memory retry of resource-shaped failures: a bigger
    # allocator budget shrinks spill drastically, and a lone worker
    # owns the whole disk — the NOTES.md r13 recipe, now automated
    def resource_shaped(row):
        err = str(row.get("err", ""))
        return (not row.get("ok")
                and ("No space left" in err or "Out of Memory" in err
                     or "oracle_timeout" in err or "worker exit" in err))

    retried = {}
    if retry:
        to_retry = sorted(n for n, r in results.items() if resource_shaped(r))
        if to_retry:
            print(f"\nretrying {len(to_retry)} resource-shaped failure(s) "
                  f"serially at ORACLE_MEMORY_LIMIT={retry_mem}: "
                  f"{to_retry}", flush=True)
            env = dict(os.environ, ORACLE_MEMORY_LIMIT=retry_mem)
            retried = run_set(to_retry, 1, 2 * t_limit, env, "serial-retry")
            for name, row in retried.items():
                # merge_correctness semantics: retry ok upgrades; a
                # retry that hits a checker wall keeps pass 1's row
                if row.get("ok") or not resource_shaped(row):
                    results[name] = row

    n_ok = sum(1 for r in results.values() if r.get("ok"))
    n_timeout = sum(1 for r in results.values()
                    if r.get("err") == "oracle_timeout")
    n_bad = len(results) - n_ok - n_timeout
    print(f"\n{n_ok} ok, {n_bad} fail, {n_timeout} oracle_timeout")
    if artifact:
        with open(artifact, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_ok": n_ok, "n_fail": n_bad,
                       "n_oracle_timeout": n_timeout,
                       "oracle_timeout_sec": t_limit,
                       "wall_budget_sec": 3 * t_limit,
                       "workers": workers,
                       "retry_memory": retry_mem if retry else None,
                       "retried": sorted(retried),
                       "protocol": "parallel-hard-timeout",
                       "queries": results}, f, indent=1, sort_keys=True)
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
