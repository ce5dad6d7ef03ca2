#!/usr/bin/env python3
"""Retry-LESS mimic of the driver's oracle leg, for reproducing and then
proving the fix for the r9 allocator-exhaustion cascade (VERDICT r9 #1).

The driver runs all 337 oracles on ONE DuckDB connection, in sorted
order, with no fresh-connection retry. At registry size 338 that run
died at sorted position 194 (sim_binary_hamming) with a cascade of
spurious OutOfMemory errors: allocator state accumulated by the heavy
unrolled-recursive-CTE oracles never drains, and eventually a trivial
query can't allocate. tools/oracle_check.py survives this only via its
fresh-connection retry — which the driver does not have.

This script is the no-retry repro: one connection, sorted order, run
every oracle AND read every Spark parquet dump through that same
connection (as the driver does), record per-query peak DuckDB memory,
and write a JSON artifact. Exit 1 iff any query errors.

Usage: driver_mimic.py <sfDir> <verifyOutDir> [jsonOut] [--cap BYTES]

--cap sets an explicit memory_limit on the connection to mimic a more
constrained driver host (the driver box showed OOM at 338 queries on a
host we can't profile; a hard cap lets us reproduce the cascade locally
and verify the fix holds under pressure).
"""
import sys, json, glob, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(argv):
    args = [a for a in argv
            if not a.startswith("--cap") and a != "--spill-first"]
    cap = None
    spill_first = "--spill-first" in argv
    for a in argv:
        if a.startswith("--cap="):
            cap = a.split("=", 1)[1]
    sf_dir, out_dir = args[0], args[1]
    json_out = args[2] if len(args) > 2 else None

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    if cap:
        con.execute(f"SET memory_limit='{cap}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    if spill_first:
        # simulate shipping the spill-arming SETs inside the sorted-first
        # oracle (the real fix lives in the Scala oracle text); keeps the
        # --cap pressure in force by NOT overriding memory_limit here
        first = sorted(oracles)[0]
        oracles[first] = (
            "SET temp_directory='/tmp/graft_duckdb_spill.tmp'; "
            "SET max_temp_directory_size='64GB'; " + oracles[first])

    n_ok = n_err = 0
    results = {}
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            srows = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            drows = con.execute(sql).fetchall()
            mem = con.execute(
                "SELECT memory_usage_bytes FROM duckdb_memory() "
                "WHERE tag='BASE_TABLE'").fetchall()
            used = con.execute(
                "SELECT sum(memory_usage_bytes) FROM duckdb_memory()"
            ).fetchall()[0][0]
            n_ok += 1
            results[name] = {"ok": True, "spark_rows": len(srows),
                             "oracle_rows": len(drows),
                             "mem_after_bytes": used,
                             "sec": round(time.time() - t0, 2)}
            print(f"ok   {name:36s} {len(drows):7d} rows  "
                  f"mem={used/1e6:8.1f}MB  {time.time()-t0:6.2f}s")
        except Exception as e:
            n_err += 1
            results[name] = {"ok": False,
                             "err": f"{type(e).__name__}: {e}"}
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    print(f"\n{n_ok} ok, {n_err} err")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "cap": cap, "n_ok": n_ok,
                       "n_err": n_err, "queries": results},
                      f, indent=1, sort_keys=True)
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
