#!/usr/bin/env bash
# Pre-handoff self-check: replicate everything the round driver will run.
#   tools/selfcheck.sh [sfDir] [outDir]
# Exits non-zero on the first failing stage. Stages:
#   0. regenerate the pinned plan artifacts (PLANSHAPE.tsv, LINEAGE.tsv)
#      — if either drifts from the committed bytes the script FAILS and
#      prints the diff: review it (a drift means a registered query's
#      plan gained/lost a wide node) and include the regenerated file in
#      the SAME commit that changed the plan. This closes the
#      artifact-freshness slip class (r10 stale ADVICE.md, r11 stale
#      PLANSHAPE.tsv) structurally: any commit touching a registered
#      query's plan must pass through here before handoff.
#   1. sbt test                 — full ScalaTest suite
#   2. graft.Verify <sfDir>     — dump every registered query to parquet
#   3. tools/oracle_check.py    — DuckDB value-level compare of the dump
# (oracle_check replicates the driver's hash compare at value level; a
# driver-only hash failure — e.g. a DuckDB type-width widening — can
# still slip through, so keep oracle types BIGINT/DOUBLE-normalized.)
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT_DIR="${2:-$(mktemp -d /tmp/graft_verify.XXXX)}"

echo "== [0/4] regenerate pinned plan artifacts"
sbt -batch "runMain graft.tools.PlanShapeDump" "runMain graft.tools.LineageDump"
if ! git diff --exit-code -- PLANSHAPE.tsv LINEAGE.tsv; then
  echo "!! PLANSHAPE.tsv / LINEAGE.tsv drifted from the committed pin."
  echo "!! Review the diff above, then git add the regenerated file(s)"
  echo "!! into the commit that changed the plan, and re-run selfcheck."
  exit 1
fi

echo "== [1/4] sbt test"
sbt -batch test

echo "== [2/4] Verify dump: $SF_DIR -> $OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"

echo "== [3/4] DuckDB oracle compare"
python3 tools/oracle_check.py "$SF_DIR" "$OUT_DIR"
