#!/usr/bin/env python3
"""Retry-LESS mimic of the driver's oracle leg, for reproducing and then
proving the fix for the r9 cascade (VERDICT r9 #1).

The driver runs all 337 oracles on ONE DuckDB connection, in sorted
order, with no fresh-connection retry, and converts results to pandas
for the hash compare. At registry size 338 that run died at sorted
position 194 (sim_binary_hamming) with a cascade of spurious
OutOfMemory errors. ROOT CAUSE (r10 diagnosis): not RAM — at DuckDB's
default threads=32 a heavy oracle's concurrent tasks hold tens of
thousands of live mmap'd allocator blocks and the process crosses the
Linux vm.max_map_count ceiling (default 65530), after which every
allocation (DuckDB's AND pyarrow's) fails as "Out of Memory" with
gigabytes free, until the connection's maps are dropped — which is
exactly why tools/oracle_check.py's fresh-connection retry always
recovered. The fix ships inside the sorted-first oracle's text
(`agg_balance_check` leads with SET threads=8 + allocator flush +
spill SETs; they persist for the connection).

This script is the no-retry repro: one connection, sorted order,
every oracle AND every Spark parquet dump read through that same
connection, each executed BOTH via fetchall() and via .df() (the
pandas leg is where the map spike peaks — r9's three "pyarrow
allocation errors" were the same ceiling), with the process's peak
/proc/self/maps count recorded in the artifact. Exit 1 iff any query
errors.

Usage: driver_mimic.py <sfDir> <verifyOutDir> [jsonOut] [--cap BYTES]
                       [--strip-sets]

--cap sets an explicit memory_limit at connect, mimicking a more
constrained driver host; the shipped SETs in the first oracle then
override it (as they would on the driver).

--strip-sets is the NEGATIVE CONTROL: drop every leading SET from the
oracle texts, restoring the r9 driver configuration (threads=32, no
flush/spill). Expected outcome: the run crashes with spurious
OutOfMemory or grazes the 65530-map ceiling at the sim_* family —
reproducing the r9 cascade on demand.
"""
import sys, json, glob, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def n_maps():
    with open(f"/proc/{os.getpid()}/maps") as f:
        return sum(1 for _ in f)


def main(argv):
    args = [a for a in argv
            if not a.startswith("--cap") and a != "--strip-sets"]
    cap = None
    strip_sets = "--strip-sets" in argv
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
    if strip_sets:
        def strip(sql):
            s = sql.lstrip()
            while s.startswith("SET "):  # drop each leading SET stmt
                parts = s.split(";", 1)
                if len(parts) != 2:  # ADVICE r10: a SET with no trailing
                    raise ValueError(  # ';' must fail with a label, not
                        f"--strip-sets: unterminated SET prelude: {s[:80]!r}")
                s = parts[1].lstrip()
            return s
        oracles = {name: strip(sql) for name, sql in oracles.items()}

    n_ok = n_err = 0
    peak_maps = n_maps()
    results = {}
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        try:
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            srows = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            drows = con.execute(sql).fetchall()
            # the pandas leg the driver's hash compare actually runs —
            # the per-query map-count spike peaks here
            con.execute(f"SELECT * FROM read_parquet({files!r})").df()
            con.execute(sql).df()
            m = n_maps()
            peak_maps = max(peak_maps, m)
            n_ok += 1
            results[name] = {"ok": True, "spark_rows": len(srows),
                             "oracle_rows": len(drows),
                             "maps_after": m,
                             "sec": round(time.time() - t0, 2)}
            print(f"ok   {name:36s} {len(drows):7d} rows  maps={m:6d}  "
                  f"{time.time()-t0:6.2f}s")
        except Exception as e:
            n_err += 1
            results[name] = {"ok": False,
                             "err": f"{type(e).__name__}: {e}"}
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    print(f"\n{n_ok} ok, {n_err} err, peak maps {peak_maps} "
          f"(vm.max_map_count ceiling: 65530 default)")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "cap": cap, "n_ok": n_ok,
                       "n_err": n_err, "peak_maps": peak_maps,
                       "queries": results},
                      f, indent=1, sort_keys=True)
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
