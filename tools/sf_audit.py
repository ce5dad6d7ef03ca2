#!/usr/bin/env python3
"""Multi-scale-factor correctness audit → checked-in artifacts.

The driver's correctness gate runs at sf0.01 only, but scale-dependent
engine divergence is real (the r8 audit caught DuckDB's nonzero-scale
decimal→double cast double-rounding past 2^53 unscaled — invisible at
sf0.01, a 1-ulp sd7 drift at sf0.1). Earlier rounds ran that audit by
hand and recorded the outcome only as NOTES.md prose; this promotes it
to a driver-visible artifact (VERDICT r8 #5): for each requested scale
factor it runs graft.Verify, compares every oracle in DuckDB via
oracle_check, and writes CORRECTNESS_sf{X}.json at the repo root.

Usage:
  tools/sf_audit.py                 # all three SFs (sf0.1 ~25 min)
  tools/sf_audit.py 0.001 0.01      # just the cheap ones

Exit 1 iff any query at any requested SF fails.
"""
import json
import os
import pathlib
import subprocess
import sys

import oracle_check

REPO = pathlib.Path(__file__).resolve().parent.parent
TESTDATA = pathlib.Path(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"))


def audit(sf: str, par: bool) -> bool:
    sf_dir = TESTDATA / f"sf{sf}"
    out_dir = pathlib.Path(f"/tmp/sf_audit_{sf}")
    subprocess.run(["rm", "-rf", str(out_dir)], check=True)
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
        cwd=REPO, check=True, stdout=sys.stderr, stderr=subprocess.DEVNULL,
    )
    artifact = REPO / f"CORRECTNESS_sf{sf}.json"
    if par:
        # big scale factors: subprocess-per-oracle with a HARD kill —
        # DuckDB's interrupt() can overrun a threading.Timer by tens of
        # minutes inside one monster pipeline task (see oracle_par.py)
        rc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "oracle_par.py"),
             str(sf_dir), str(out_dir), str(artifact)]).returncode
    else:
        rc = oracle_check.main(str(sf_dir), str(out_dir), str(artifact))
    print(f"sf{sf}: wrote {artifact.name}")
    return rc == 0


def main() -> int:
    par = "--par" in sys.argv[1:]
    sfs = [a for a in sys.argv[1:] if not a.startswith("--")] or \
        ["0.001", "0.01", "0.1"]
    ok = True
    for sf in sfs:
        ok = audit(sf, par) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
