#!/usr/bin/env python3
"""Per-query scale-law check: compare a Bench run at K× data against a
reference run and flag kernels growing faster than K·slack — the
empirical leg of every "scales to 100 TB" claim (VERDICT r10 #5).

A query whose runtime grows ≤ K× under K× data is (at worst) linear;
sub-K growth is common (fixed per-query overhead dominates small
kernels). Growth > K·slack with a meaningful absolute delta means a
super-linear kernel — a quadratic candidate stage, a partition-less
window, a driver-side bottleneck — and is exactly what must not ship
for 100 TB.

Usage: tools/scale_law.py BIG.json REF.json K [slack=2.0]
Exit 1 iff any query exceeds the law.
"""
import json
import pathlib
import sys

ABS_FLOOR_SEC = 2.0  # ignore sub-2s absolute growth: JVM noise territory


def main() -> int:
    big = json.loads(pathlib.Path(sys.argv[1]).read_text())
    ref = json.loads(pathlib.Path(sys.argv[2]).read_text())
    k = float(sys.argv[3])
    slack = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    bq, rq = big["queries"], ref["queries"]
    flagged, checked = [], 0
    for name in sorted(bq):
        b, r = bq.get(name), rq.get(name)
        if b is None or r is None or b < 0 or r < 0:
            continue
        checked += 1
        if b > r * k * slack and b - r > ABS_FLOOR_SEC:
            flagged.append((name, r, b, b / max(r, 1e-9)))
    for name, r, b, ratio in flagged:
        print(f"SUPERLINEAR {name}: {r:.2f}s -> {b:.2f}s "
              f"({ratio:.1f}x under {k:.0f}x data, law allows {k * slack:.0f}x)")
    bt = sum(s for s in bq.values() if s >= 0)
    rt = sum(s for s in rq.values() if s >= 0)
    print(f"{checked} queries checked: total {rt:.1f}s -> {bt:.1f}s "
          f"({bt / max(rt, 1e-9):.2f}x under {k:.0f}x data) — "
          f"{len(flagged)} super-linear")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
