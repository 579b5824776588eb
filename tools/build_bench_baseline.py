#!/usr/bin/env python3
"""Build BENCH_BASELINE.json: per-query MIN across every committed
BENCH_FULL.json record in git history.

Why (r16 verdict #1): the bench outlier guard anchored to only the
immediately-prior record lets compounding drift ratchet past its 3x
trigger — t24–t27 reached 3–5x over r15 in two under-threshold steps
and the record self-certified `anomalous: []`. The per-query minimum
across ALL committed records is the contention-resistant anchor: a
contaminated record can only RAISE a query's number, never lower the
historical min.

Usage: python3 tools/build_bench_baseline.py  (from anywhere in repo)
Writes BENCH_BASELINE.json at the repo root; Bench.scala merges it
(per-query min) with the prior BENCH_FULL.json so queries added after
the last baseline build stay guarded too.
"""
import json
import subprocess
import sys
from pathlib import Path

repo = Path(
    subprocess.run(["git", "rev-parse", "--show-toplevel"],
                   capture_output=True, text=True, check=True)
    .stdout.strip())

commits = subprocess.run(
    ["git", "-C", str(repo), "log", "--format=%H", "--", "BENCH_FULL.json"],
    capture_output=True, text=True, check=True).stdout.split()

SF = "sf0.1"  # the committed-record scale; sf0.01 smoke runs that were
# committed under the same filename would otherwise poison the minima
# with ~10x-smaller-corpus numbers (found the hard way: s2's "0.227 s
# historical min" was an sf0.01 record, flagging every honest sf0.1
# reading as anomalous)

mins: dict[str, float] = {}
used = 0
skipped_sf = 0
for h in commits:
    show = subprocess.run(
        ["git", "-C", str(repo), "show", f"{h}:BENCH_FULL.json"],
        capture_output=True, text=True)
    if show.returncode != 0:
        continue
    try:
        rec = json.loads(show.stdout)
    except json.JSONDecodeError:
        continue
    qs = rec.get("queries")
    if not isinstance(qs, dict):
        continue
    if str(rec.get("sf", "")).rstrip("/").split("/")[-1] != SF:
        skipped_sf += 1
        continue
    used += 1
    for k, v in qs.items():
        if isinstance(v, (int, float)) and v >= 0:
            if k not in mins or v < mins[k]:
                mins[k] = float(v)

out = {
    "built_from": f"git log -- BENCH_FULL.json ({used} {SF} records, "
                  f"{skipped_sf} other-sf skipped)",
    "queries": {k: mins[k] for k in sorted(mins)},
}
(repo / "BENCH_BASELINE.json").write_text(
    json.dumps(out, separators=(",", ":")) + "\n")
print(f"BENCH_BASELINE.json: {len(mins)} queries, min over {used} "
      f"{SF} records ({skipped_sf} other-sf skipped)", file=sys.stderr)
