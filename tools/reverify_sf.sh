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
#   2. regenerates them at the target scale (tools/golden_ext.py — the
#      banded-candidate recall audit is a HARD GATE: golden_ext.py exits
#      nonzero if the audit would be skipped, and this script additionally
#      requires an "ok" audit record and copies it into $OUT; set
#      GRAFT_ALLOW_AUDIT_SKIP=1 only if you verify recall by other means),
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
[ -f "$GOLD/recall_audit.txt" ] && cp "$GOLD/recall_audit.txt" "$BACKUP/"
restore() {
  cp "$BACKUP"/*.tsv "$GOLD/"
  [ -f "$BACKUP/recall_audit.txt" ] && cp "$BACKUP/recall_audit.txt" "$GOLD/" || true
}
trap restore EXIT

echo "== regenerating goldens at $SF_DIR =="
AUDIT_FLAG=""
[ "${GRAFT_ALLOW_AUDIT_SKIP:-0}" = "1" ] && AUDIT_FLAG="--allow-audit-skip"
python3 tools/golden_ext.py "$SF_DIR" "$GOLD" $AUDIT_FLAG

echo "== banding-recall audit gate =="
AUDIT_REC="$GOLD/recall_audit.txt"
[ -f "$AUDIT_REC" ] || { echo "FATAL: no recall_audit.txt written"; exit 1; }
cat "$AUDIT_REC"
if ! grep -q ': ok ' "$AUDIT_REC"; then
  if [ "${GRAFT_ALLOW_AUDIT_SKIP:-0}" = "1" ]; then
    echo "WARNING: recall audit skipped (GRAFT_ALLOW_AUDIT_SKIP=1) —" \
         "x14/x16/x25/x77 comparisons carry NO banding-recall guarantee"
  else
    echo "FATAL: recall audit did not run clean"; exit 1
  fi
fi
mkdir -p "$OUT"
cp "$AUDIT_REC" "$OUT/recall_audit.txt"

echo "== Verify at $SF_DIR =="
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify $SF_DIR $OUT"

echo "== DuckDB compare =="
python3 tools/check_oracle.py "$OUT" "$SF_DIR"

echo "== restoring committed goldens =="
restore
trap - EXIT
echo "reverify OK at $SF_DIR"
