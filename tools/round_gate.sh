#!/usr/bin/env bash
# Round gate: refuse to call a round "done" unless the build compiles
# (main + test sources) and the round produced substantive movement.
# Rounds 6-7 shipped with almost no src/ change and nobody noticed until
# the verdict — this is the end-of-round check that catches it early.
#
# Usage: tools/round_gate.sh [BASE_REF]
#   BASE_REF: commit the round started from. Default: the latest
#   driver-written "round N: verdict/advice" commit; falls back to
#   HEAD~10, then the root commit.
#
# Pass criteria:
#   1. `sbt Test/compile` exits 0.
#   2. src/ changed since BASE_REF (committed or uncommitted), OR
#      ROUND_GATE_ALLOW_DOCS=1 is set and README/tools moved instead
#      (a docs-only round closing verdict hygiene items — say so in the
#      round notes).
set -euo pipefail
cd "$(dirname "$0")/.."

base="${1:-}"
if [ -z "$base" ]; then
  base=$(git log --grep='verdict/advice' --format=%H -n1 2>/dev/null || true)
fi
if [ -z "$base" ]; then
  base=$(git rev-parse HEAD~10 2>/dev/null \
    || git rev-list --max-parents=0 HEAD)
fi

echo "[gate] base: $(git log --oneline -n1 "$base")"

echo "[gate] sbt Test/compile..."
if ! sbt -batch "Test/compile" >/tmp/round_gate_compile.log 2>&1; then
  tail -30 /tmp/round_gate_compile.log
  echo "[gate] FAIL: Test/compile failed (full log: /tmp/round_gate_compile.log)"
  exit 1
fi

src_changed=$(git diff --name-only "$base"..HEAD -- src/ | wc -l)
src_dirty=$(git status --porcelain src/ | wc -l)
if [ "$src_changed" -eq 0 ] && [ "$src_dirty" -eq 0 ]; then
  docs_changed=$(git diff --name-only "$base"..HEAD -- README.md tools/ | wc -l)
  if [ "${ROUND_GATE_ALLOW_DOCS:-0}" = "1" ] && [ "$docs_changed" -gt 0 ]; then
    echo "[gate] OK (docs-only override): $docs_changed README/tools file(s) moved, no src/ change"
    exit 0
  fi
  echo "[gate] FAIL: no src/ change since base (stall — close a verdict item, or set ROUND_GATE_ALLOW_DOCS=1 for a docs-only round)"
  exit 1
fi

echo "[gate] OK: Test/compile green; src/ files changed: $src_changed committed, $src_dirty uncommitted"
