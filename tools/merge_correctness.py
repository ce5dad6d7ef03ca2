#!/usr/bin/env python3
"""Merge partial oracle-compare artifacts into one CORRECTNESS file.

Later files win per query, EXCEPT that an `ok` row is never replaced
by a CHECKER-LIMITED non-ok row (oracle_timeout, or an OOM raised in
the oracle phase): a big-memory/long-wall re-run upgrading a timeout
to ok must stick, and a re-run that itself times out must not
downgrade an earlier pass. A GENUINE fail (value mismatch, rowcount,
dtype drift, engine-side error) always wins over an earlier ok — and
is announced loudly — so merging artifacts that span a code change
can never silently erase a real regression (ADVICE r11).

OOM classification (ADVICE r11): "Out of Memory" counts as
checker-limited ONLY when the row's `phase` tag says the oracle-side
query raised it (oracle_par.py tags phases since r12). An untagged or
engine_output-phase OOM stays in n_fail.

Usage: tools/merge_correctness.py OUT.json IN1.json IN2.json ...
"""
import json
import pathlib
import sys


def checker_limited(row) -> bool:
    if row.get("ok"):
        return False
    err = str(row.get("err"))
    if "oracle_timeout" in err:
        return True
    return "Out of Memory" in err and row.get("phase") == "oracle"


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
                if checker_limited(row):
                    continue  # keep the earlier ok: re-run hit a checker wall
                print(f"WARNING: {name}: earlier ok REPLACED by genuine "
                      f"fail from {p}: {row.get('err')}", file=sys.stderr)
            merged[name] = row
    n_ok = sum(1 for r in merged.values() if r.get("ok"))
    n_timeout = sum(1 for r in merged.values() if checker_limited(r))
    n_bad = len(merged) - n_ok - n_timeout
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "n_ok": n_ok, "n_fail": n_bad,
                   "n_oracle_timeout": n_timeout,
                   "oracle_timeout_sec": t_limit,
                   "protocol": "parallel-hard-timeout(merged)",
                   "queries": merged}, f, indent=1, sort_keys=True)
    print(f"{out}: {len(merged)} queries — {n_ok} ok, {n_bad} fail, "
          f"{n_timeout} checker-limited (timeout/oracle-oom)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
