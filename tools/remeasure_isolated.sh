#!/usr/bin/env bash
# Isolated re-measurement of drifted bench queries — the r16 review's
# decisive diagnostic, automated. Given a comma-separated key list, run
# ONLY those queries in a fresh JVM with the outlier guard disabled,
# and print committed-vs-isolated ratios so the reader can tell
#   - in-suite contamination (isolated << committed: the t19/t24-t27
#     cluster read ~2.2x its isolated time inside the full suite), from
#   - a real regression / host step change (the drift REPRODUCES
#     isolated: the r15->r16 x48/x46/x20 1.6-1.8x step).
#
# Usage: tools/remeasure_isolated.sh t19,t24,t25 [SF_DIR]
#   SF_DIR defaults to /root/testdata/sf0.1 (the committed-record scale).
# Reads the committed numbers from the working-tree BENCH_FULL.json;
# point BENCH_COMMITTED at another record to compare against.
set -euo pipefail
cd "$(dirname "$0")/.."

keys="${1:?usage: remeasure_isolated.sh key1,key2[,...] [SF_DIR]}"
sf="${2:-/root/testdata/sf0.1}"
committed="${BENCH_COMMITTED:-BENCH_FULL.json}"
out=/tmp/remeasure_isolated.json

echo "[remeasure] keys=$keys sf=$sf (guard disabled, fresh JVM)"
SPARK_GRAFT_ONLY="$keys" \
SPARK_GRAFT_SF_DIR="$sf" \
SPARK_GRAFT_BENCH_BASELINE=/nonexistent \
SPARK_GRAFT_BENCH_OUT="$out" \
sbt -batch "runMain graft.Bench" >/tmp/remeasure_isolated.log 2>&1 \
  || { tail -20 /tmp/remeasure_isolated.log; exit 1; }

python3 - "$committed" "$out" <<'EOF'
import json, sys
committed = json.load(open(sys.argv[1]))["queries"]
isolated = json.load(open(sys.argv[2]))["queries"]
print(f"{'query':28s} {'committed':>10s} {'isolated':>10s} {'ratio':>7s}")
for k in sorted(isolated):
    iso, com = isolated[k], committed.get(k)
    if com is None or com < 0 or iso < 0:
        print(f"{k:28s} {com if com is not None else 'n/a':>10} {iso:>10.3f}     n/a")
        continue
    r = com / iso if iso > 0 else float("inf")
    verdict = "contaminated" if r > 1.5 else ("regression?" if r < 0.67 else "consistent")
    print(f"{k:28s} {com:>10.3f} {iso:>10.3f} {r:>6.2f}x  {verdict}")
print("\nratio >1.5x = the committed record was contaminated (re-bench);")
print("~1x = the committed number reproduces (real code/host speed).")
EOF
