#!/usr/bin/env bash
# Pre-handoff self-check: replicate everything the round driver will run.
#   tools/selfcheck.sh [sfDir] [outDir]
# Exits non-zero on the first failing stage. Stages:
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

echo "== [1/3] sbt test"
sbt -batch test

echo "== [2/3] Verify dump: $SF_DIR -> $OUT_DIR"
sbt -batch "runMain graft.Verify $SF_DIR $OUT_DIR"

echo "== [3/3] DuckDB oracle compare"
python3 tools/oracle_check.py "$SF_DIR" "$OUT_DIR"
