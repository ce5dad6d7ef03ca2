#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: run Verify's parquet
dumps against DuckDB executing oracle_sql.json on the same testdata
parquet, compare row multisets exactly (values AND python types).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # exact compare, but unify float/Decimal-int representations per engine
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v

def rows_key(rows):
    return sorted(
        (tuple(str(type(x).__name__) + ":" + repr(norm(x)) for x in r))
        for r in rows)

def apply_sets(con):
    # same environment caps the agg_balance_check SET prelude applies
    # (ADVICE r10): applying them at connect time AND re-applying before
    # every query means (a) the mmap-ceiling protection no longer
    # depends on that oracle sorting first, and (b) an oracle's own SET
    # prelude can't pin its limits onto every later query in the run.
    # ORACLE_MEMORY_LIMIT raises the ceiling for big local scale legs
    # (sf1's dedup graph CTEs need > 4GB); the driver's own gate runs
    # at sf0.01 where the default is generous.
    import os
    con.execute("SET TimeZone='UTC'")
    con.execute("SET threads=8")
    con.execute("SET allocator_flush_threshold='16mb'")
    # per-PROCESS spill dir: oracle_par runs one DuckDB per subprocess,
    # and two processes sharing one temp_directory corrupt each other's
    # spill blocks (r12 sf10: "Could not read enough bytes" mid-join)
    con.execute("SET temp_directory='/tmp/graft_duckdb_spill.%d.tmp'"
                % os.getpid())
    con.execute("SET max_temp_directory_size='64GB'")
    con.execute("SET memory_limit='%s'"
                % os.environ.get("ORACLE_MEMORY_LIMIT", "4GB"))


def fresh_con(sf_dir):
    con = duckdb.connect()
    apply_sets(con)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def main(sf_dir, out_dir, json_out=None):
    import os
    import threading
    # per-query wall-clock ceiling (seconds). Unset = no ceiling (the
    # driver's sf0.01 gate). Local SCALE legs set it: some oracles are
    # deliberately quadratic forms of linear engine kernels (the
    # recursive-CTE transitive closure behind dedup_cc is O(sum
    # cluster_size^2) — 200M closure rows at sf1 where the engine's
    # min-label propagation is linear), so at big sf the ORACLE is the
    # bottleneck; a hung oracle is then recorded as `oracle_timeout`
    # (a statement about the checker, distinct from a FAIL, which
    # remains a statement about the engine).
    t_limit = os.environ.get("ORACLE_TIMEOUT_SEC")
    t_limit = float(t_limit) if t_limit else None
    con = fresh_con(sf_dir)
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = n_timeout = 0
    results = {}
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark parquet output"); n_bad += 1
            results[name] = {"ok": False, "err": "no spark parquet output"}
            continue
        # one retry on a FRESH connection: 250+ sequential oracles (some
        # with heavy recursive CTEs) accumulate allocator state in one
        # DuckDB connection, and a tiny later query can hit a spurious
        # Out of Memory that a clean connection answers in a second —
        # observed at sf0.001 on sim_ivf_recall_curve
        err = None
        timed_out = False
        for attempt in (0, 1):
            if attempt:
                con.close()
                con = fresh_con(sf_dir)
            timer = (threading.Timer(t_limit, con.interrupt)
                     if t_limit else None)
            if timer:
                timer.start()
            try:
                apply_sets(con)  # undo any prior oracle's SET prelude
                spark_rel = con.execute(
                    f"SELECT * FROM read_parquet({files!r})")
                spark_cols = [c[0] for c in spark_rel.description]
                spark_rows = spark_rel.fetchall()
                duck_rel = con.execute(sql)
                duck_cols = [c[0] for c in duck_rel.description]
                duck_rows = duck_rel.fetchall()
                err = None
                break
            except duckdb.InterruptException:
                timed_out = True
                err = None
                break  # a timeout is deterministic here — don't retry
            except Exception as e:
                err = e
            finally:
                if timer:
                    timer.cancel()
        if timed_out:
            print(f"TIMEOUT {name}: oracle exceeded {t_limit:.0f}s")
            n_timeout += 1
            results[name] = {"ok": False, "err": "oracle_timeout"}
            con.close()
            con = fresh_con(sf_dir)
            continue
        if err is not None:
            print(f"FAIL {name}: {type(err).__name__}: {err}"); n_bad += 1
            results[name] = {"ok": False,
                             "err": f"{type(err).__name__}: {err}"}
            continue
        # driver sorts columns by name before hashing — do the same
        s_ix = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        d_ix = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns {sorted(spark_cols)} != {sorted(duck_cols)}")
            n_bad += 1
            results[name] = {"ok": False, "err":
                f"columns {sorted(spark_cols)} != {sorted(duck_cols)}"}
            continue
        srows = [[r[i] for i in s_ix] for r in spark_rows]
        drows = [[r[i] for i in d_ix] for r in duck_rows]
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_bad += 1
            results[name] = {"ok": False, "err":
                f"rowcount spark={len(srows)} duck={len(drows)}"}
            continue
        # pandas-dtype drift check: the driver compares pandas frames, so a
        # DuckDB HUGEINT (SUM over ints -> float64 in .df()) vs Spark BIGINT
        # (int64) hashes differently even when fetchall() values are equal.
        # Catch that class here by comparing .df() dtypes on both sides.
        err = None
        for attempt in (0, 1):
            if attempt:
                con.close()
                con = fresh_con(sf_dir)
            # generous 2x budget for the re-execution: the first pass
            # already proved the oracle completes within t_limit
            timer = (threading.Timer(2 * t_limit, con.interrupt)
                     if t_limit else None)
            if timer:
                timer.start()
            try:
                sdt = con.execute(
                    f"SELECT * FROM read_parquet({files!r})").df().dtypes
                ddt = con.execute(sql).df().dtypes
                err = None
                break
            except Exception as e:
                err = e
            finally:
                if timer:
                    timer.cancel()
        if err is not None:
            print(f"FAIL {name}: dtype check: {type(err).__name__}: {err}")
            n_bad += 1
            results[name] = {"ok": False,
                             "err": f"dtype check: {type(err).__name__}: {err}"}
            continue
        s_dt = {c: str(t) for c, t in sdt.items()}
        d_dt = {c: str(t) for c, t in ddt.items()}
        dtype_diffs = {c: (s_dt[c], d_dt[c])
                       for c in s_dt if c in d_dt and s_dt[c] != d_dt[c]}
        if dtype_diffs:
            print(f"FAIL {name}: pandas dtype drift {dtype_diffs}")
            n_bad += 1
            results[name] = {"ok": False,
                             "err": f"pandas dtype drift {dtype_diffs}"}
            continue
        sk, dk = rows_key(srows), rows_key(drows)
        if sk != dk:
            diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs:")
            for a, b in diffs:
                print(f"   spark={a}\n   duck ={b}")
            n_bad += 1
            results[name] = {"ok": False, "err": "value mismatch",
                             "first_diff": [repr(d) for d in diffs[:1]]}
            continue
        print(f"ok   {name} ({len(srows)} rows)")
        n_ok += 1
        results[name] = {"ok": True, "rows": len(srows)}
    suffix = f", {n_timeout} oracle_timeout" if n_timeout else ""
    print(f"\n{n_ok} ok, {n_bad} fail{suffix}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_ok": n_ok, "n_fail": n_bad,
                       "n_oracle_timeout": n_timeout,
                       "oracle_timeout_sec": t_limit,
                       "queries": results}, f, indent=1, sort_keys=True)
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
