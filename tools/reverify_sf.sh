#!/usr/bin/env bash
# Re-verify the FULL driver contract at an arbitrary scale factor —
# the repeatable form of the r14/r15 "10x-scale re-verification":
#
#   tools/reverify_sf.sh /root/testdata/sf0.1
#
# The VALUES-golden oracles (minhash/simhash/winnowing/sign-LSH/ANN/PQ/
# semDedup families + the x14/x16/x25/x77 candidate lists) are pinned at
# sf0.01 in src/main/resources/goldens; at any other scale they must be
# re-derived from the independent Python mirror first. This script:
#   1. backs up the committed goldens,
#   2. regenerates them at the target scale (tools/golden_ext.py — runs
#      the banded-candidate recall audit when the corpus is small enough),
#   3. rebuilds, runs graft.Verify at the target scale, compares every
#      query against DuckDB (tools/check_oracle.py),
#   4. restores the committed goldens and rebuilds, leaving the tree
#      exactly as found.
# Exits nonzero if any step or any oracle comparison fails.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:?usage: tools/reverify_sf.sh /root/testdata/sfX.Y [outdir]}"
OUT="${2:-/tmp/reverify_$(basename "$SF_DIR")}"
GOLD=src/main/resources/goldens
BACKUP="$(mktemp -d /tmp/goldens_backup.XXXXXX)"

cp "$GOLD"/*.tsv "$BACKUP/"
restore() { cp "$BACKUP"/*.tsv "$GOLD/"; }
trap restore EXIT

echo "== regenerating goldens at $SF_DIR =="
python3 tools/golden_ext.py "$SF_DIR" "$GOLD"

echo "== Verify at $SF_DIR =="
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT"

echo "== DuckDB compare =="
python3 tools/check_oracle.py "$OUT" "$SF_DIR"

echo "== restoring committed goldens =="
restore
trap - EXIT
echo "reverify OK at $SF_DIR"
