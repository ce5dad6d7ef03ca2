#!/usr/bin/env python3
"""Merge partial oracle-compare artifacts into one CORRECTNESS file.

Later files win per query, EXCEPT that an `ok` row is never replaced
by a non-ok row (a big-memory/long-wall re-run upgrading a timeout to
ok must stick, and a re-run that itself times out must not downgrade
an earlier pass). Totals are recomputed from the merged rows.

Usage: tools/merge_correctness.py OUT.json IN1.json IN2.json ...
"""
import json
import pathlib
import sys


def main() -> int:
    out = sys.argv[1]
    merged = {}
    sf_dir = None
    t_limit = None
    for p in sys.argv[2:]:
        d = json.loads(pathlib.Path(p).read_text())
        sf_dir = sf_dir or d.get("sf_dir")
        t_limit = max(t_limit or 0, d.get("oracle_timeout_sec") or 0)
        for name, row in d["queries"].items():
            if name in merged and merged[name].get("ok") and not row.get("ok"):
                continue
            merged[name] = row
    n_ok = sum(1 for r in merged.values() if r.get("ok"))
    n_timeout = sum(
        1 for r in merged.values()
        if not r.get("ok") and ("oracle_timeout" in str(r.get("err"))
                                or "Out of Memory" in str(r.get("err"))))
    n_bad = len(merged) - n_ok - n_timeout
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "n_ok": n_ok, "n_fail": n_bad,
                   "n_oracle_timeout": n_timeout,
                   "oracle_timeout_sec": t_limit,
                   "protocol": "parallel-hard-timeout(merged)",
                   "queries": merged}, f, indent=1, sort_keys=True)
    print(f"{out}: {len(merged)} queries — {n_ok} ok, {n_bad} fail, "
          f"{n_timeout} checker-limited (timeout/oom)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
