#!/usr/bin/env python3
"""Scale-up testdata generator (VERDICT r10 #5): build an sfN dir by
replicating an existing driver-generated sf dir K times with consistent
key shifts, so every distribution, referential link and planted
structure (near-dup clusters, event funnels, skew) is preserved while
row counts scale exactly by K. Deterministic — no RNG at all.

Shift discipline: each fact/dim table's replica k adds k * (max(key)+1)
to its primary key, and every foreign key shifts by ITS referenced
table's stride, so joins land exactly as in the source data (replica k
joins replica k). region/nation stay fixed (25 nations is the world,
not a sample). Document texts are REPLICA-SALTED in replicas k >= 1
(every token gets a '_r<k>' suffix — the DedupScaleSpec fixture
discipline): each replica carries the source corpus's exact internal
near-dup/exact-dup structure in its own disjoint token universe, so
dedup cluster COUNT scales by K with cluster sizes unchanged — the
clean x-K scale law. (The first attempt appended one unique token
instead; that left replicas cross-replica NEAR-duplicates, inflating
near-dup clusters x-K in SIZE and the quadratic in-cluster kernels
x-K^2 — the dedup_cc oracle's transitive closure blew up at sf1.)
Known, accepted distribution shift: per-source token counts scale x-K
while each salted variant keeps its sf-source frequency, so corpus
frequency-THRESHOLD queries (sketch_heavyhitters, stream_freq_feed)
go empty at the scaled corpus — still hash-correct (both engines
compute the same empty result), just degenerate there.

Skew mode (--skew, VERDICT r11 #4): after replication, plant the four
pathological shapes a uniform corpus never exercises — deterministic
CASE rewrites, so both engines still compute over identical data and
every oracle stays valid:
  - CELEBRITY USER: events with event_id % 50 = 0 (2%) reassign to
    the corpus's min user_id — one user owns ~1% of all events (the
    per-user window/sessionize partitions get a giant partition).
  - GIANT DAY: events with event_id % 7 = 0 move to the corpus's max
    date, keeping time-of-day — one day holds ~16% of events (~5x the organic max) (daily
    rollups get a hot group).
  - HOT JOIN KEY: lineitem with l_orderkey % 4 = 0 (25%) point
    l_partkey at the min part key — one part joins a fat fact slice
    (the salted-join shape).
  - MEGA DEDUP CLUSTER: documents with doc_id % 40 = 0 (2.5%) share
    ONE fixed text over a disjoint token universe — identical MinHash
    signatures put every member (plus each one's planted near-clone:
    40 % 10 = 0) in one band bucket, forming a single ~5%-of-corpus
    connected component (the giant-cluster argmax/CC paths).

Usage: tools/gen_sf.py <srcDir> <dstDir> [K=10] [--skew]
e.g.:  tools/gen_sf.py /root/testdata/sf0.1 /root/repo/testdata_sf1 10
       tools/gen_sf.py /root/testdata/sf0.1 /root/repo/testdata_skew 1 --skew
"""
import pathlib
import sys

import duckdb


def main() -> int:
    skew = "--skew" in sys.argv
    argv = [a for a in sys.argv if a != "--skew"]
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    dst = argv[2] if len(argv) > 2 else "/root/repo/testdata_sf1"
    k = int(argv[3]) if len(argv) > 3 else 10
    pathlib.Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{src}/{t}.parquet')")

    def stride(table: str, key: str) -> int:
        return con.execute(f"SELECT max({key}) + 1 FROM {table}").fetchone()[0]

    c = stride("customer", "c_custkey")
    s = stride("supplier", "s_suppkey")
    p = stride("part", "p_partkey")
    o = stride("orders", "o_orderkey")
    e = stride("events", "event_id")
    u = stride("events", "user_id")
    d = stride("documents", "doc_id")
    v = stride("embeddings", "vec_id")

    reps = f"(SELECT unnest(range({k})) AS k)"
    jobs = {
        # world tables: fixed
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT c_custkey + r.k * {c} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM customer, {reps} r""",
        "supplier": f"""
            SELECT s_suppkey + r.k * {s} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM supplier, {reps} r""",
        "part": f"""
            SELECT p_partkey + r.k * {p} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM part, {reps} r""",
        "orders": f"""
            SELECT o_orderkey + r.k * {o} AS o_orderkey,
                   o_custkey + r.k * {c} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders, {reps} r""",
        "lineitem": f"""
            SELECT l_orderkey + r.k * {o} AS l_orderkey,
                   l_partkey + r.k * {p} AS l_partkey,
                   l_suppkey + r.k * {s} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem, {reps} r""",
        "events": f"""
            SELECT event_id + r.k * {e} AS event_id, ts,
                   user_id + r.k * {u} AS user_id,
                   event_type, value, props
            FROM events, {reps} r""",
        "documents": f"""
            SELECT doc_id, text2 AS text, lang, source,
                   CAST(length(text2) AS BIGINT) AS n_chars
            FROM (
              SELECT doc_id + r.k * {d} AS doc_id, lang, source,
                     CASE WHEN r.k = 0 THEN text
                          ELSE array_to_string(list_transform(
                                 list_filter(string_split(text, ' '),
                                             x -> x <> ''),
                                 t -> t || '_r' || CAST(r.k AS VARCHAR)),
                               ' ') END AS text2
              FROM documents, {reps} r) s""",
        "embeddings": f"""
            SELECT vec_id + r.k * {v} AS vec_id, embedding, label
            FROM embeddings, {reps} r""",
    }
    if skew:
        min_user = con.execute("SELECT MIN(user_id) FROM events").fetchone()[0]
        max_day = con.execute(
            "SELECT MAX(CAST(ts AS DATE)) FROM events").fetchone()[0]
        min_part = con.execute(
            "SELECT MIN(l_partkey) FROM lineitem").fetchone()[0]
        # disjoint token universe: no organic doc can near-dup a mega doc
        mega = " ".join(f"megadup{i}" for i in range(60))
        jobs["events"] = f"""
            SELECT event_id,
                   CASE WHEN event_id % 7 = 0
                        THEN DATE '{max_day}' + (ts - CAST(ts AS DATE))
                        ELSE ts END AS ts,
                   CASE WHEN event_id % 50 = 0 THEN {min_user}
                        ELSE user_id END AS user_id,
                   event_type, value, props
            FROM ({jobs['events']}) base"""
        jobs["lineitem"] = f"""
            SELECT l_orderkey,
                   CASE WHEN l_orderkey % 4 = 0 THEN {min_part}
                        ELSE l_partkey END AS l_partkey,
                   l_suppkey, l_linenumber, l_quantity, l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM ({jobs['lineitem']}) base"""
        jobs["documents"] = f"""
            SELECT doc_id,
                   CASE WHEN doc_id % 40 = 0 THEN '{mega}' ELSE text END
                     AS text,
                   lang, source,
                   CAST(length(CASE WHEN doc_id % 40 = 0 THEN '{mega}'
                               ELSE text END) AS BIGINT) AS n_chars
            FROM ({jobs['documents']}) base"""
    for t, q in jobs.items():
        order = {"region": "1", "nation": "1", "customer": "1",
                 "supplier": "1", "part": "1", "orders": "1",
                 "lineitem": "1, l_linenumber, l_partkey",
                 "events": "1", "documents": "1", "embeddings": "1"}[t]
        con.execute(f"COPY ({q} ORDER BY {order}) TO '{dst}/{t}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
