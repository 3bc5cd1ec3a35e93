#!/usr/bin/env bash
# Hermetic selftest for the verification TOOLING itself — every
# adjudication / failure path the round-gates depend on, runnable in
# seconds with no sbt build and no mutation of the real repo:
#
#   tools/selftest.sh
#
# Rationale: a gate whose failure mode is only ever exercised by hand
# in one session is itself unverified. This script pins, repeatably:
#   A. baseline_check.py's full exit-code contract (0 keep / 2 adopt /
#      3 committed-file-invalid) including all three "clean" taint
#      legs (failed-null entry, regressed list, evict_blocks), the
#      provenance refusals, and the entry-set/sf comparability refusal
#      (a sweep measuring different WORK must never auto-adopt on a
#      lower total) — in a THROWAWAY git repo, so `git show
#      HEAD:` sees controlled fixtures and the real canonical is
#      never touched.
#   B. golden_ext.recall_audit's four decision paths (ok / missed pair
#      / refuse-to-skip / allowed-skip) under BOTH python3 and
#      python3 -O — the -O leg is the regression test for the
#      assert-stripping hazard (PYTHONOPTIMIZE removes asserts; the
#      gate must fail via explicit exit, not assert).
#   C. the end-to-end reverify hook: golden_ext.py main() with
#      GRAFT_AUDIT_FLOP_CAP=1 must die before writing any golden or
#      audit record, and must proceed with --allow-audit-skip.
# Exits nonzero on the first divergence from the pinned contract.
set -euo pipefail
cd "$(dirname "$0")/.."
REPO="$PWD"
TMP="$(mktemp -d /tmp/graft_selftest.XXXXXX)"
trap 'rm -rf "$TMP"' EXIT
PASS=0

check() { # check <name> <expected_exit> <grep_pattern> <cmd...>
  local name="$1" want="$2" pat="$3"; shift 3
  local out rc=0
  out="$("$@" 2>&1)" || rc=$?
  if [ "$rc" != "$want" ]; then
    echo "FAIL $name: exit $rc, expected $want"; echo "$out" | sed 's/^/    /'
    exit 1
  fi
  if ! echo "$out" | grep -q "$pat"; then
    echo "FAIL $name: output lacks /$pat/"; echo "$out" | sed 's/^/    /'
    exit 1
  fi
  PASS=$((PASS + 1)); echo "ok   $name (exit $rc, /$pat/)"
}

# ---------- A. baseline_check.py in a throwaway repo ----------
BC="$REPO/tools/baseline_check.py"
FIX="$TMP/repo"
mkdir -p "$FIX"
git -C "$FIX" init -q
git -C "$FIX" config user.email t@t && git -C "$FIX" config user.name t

mk() { # mk <heap_gb|null> <wall> <regressed_json> <evict> <entry_json|null> [sf] [extra_entry]
  python3 - "$@" <<'EOF'
import json, sys
args = sys.argv[1:]
heap, wall, regressed, evict, entry = args[:5]
d = {"fmt": "[wall_s,cpu_s,gc_ms,jit_ms,evict_blocks,stor_mb,task_cpu_s]",
     "sf": args[5] if len(args) > 5 else "/x", "reps": 3,
     "total": [float(wall), 10.0, 100],
     "regressed": json.loads(regressed),
     "entries": {"q01": [0.1, 0.2, 0, 0, int(evict), 1, 0.0],
                 "q02": None if entry == "null" else [0.2, 0.3, 0, 0, 0, 1, 0.0]}}
if len(args) > 6:
    d["entries"][args[6]] = [0.1, 0.2, 0, 0, 0, 1, 0.0]
if heap != "null":
    d["heap_gb"] = int(heap)
print(json.dumps(d))
EOF
}

mk 8 37.5 '[]' 0 ok > "$FIX/bench.json"
git -C "$FIX" add bench.json && git -C "$FIX" commit -qm canonical

run_bc() { (cd "$FIX" && python3 "$BC" bench.json); }

check "A1 identical -> keep"            0 "nothing to reconcile"  run_bc
mk 89 34.0 '[]' 0 ok > "$FIX/bench.json"
check "A2 driver refresh -> keep"       0 "DRIVER REFRESH"        run_bc
mk 8 34.0 '[]' 0 ok > "$FIX/bench.json"
check "A3 faster clean 8g -> ADOPT"     2 "SHOULD become"         run_bc
mk 8 34.0 '["q01"]' 0 ok > "$FIX/bench.json"
check "A4 faster but regressed -> keep" 0 "tainted.*regressed"    run_bc
mk 8 34.0 '[]' 3 ok > "$FIX/bench.json"
check "A5 faster but evicted -> keep"   0 "tainted.*evict_blocks" run_bc
mk 8 34.0 '[]' 0 null > "$FIX/bench.json"
check "A6 faster but failed entry"      0 "tainted.*failed"       run_bc
mk 8 39.0 '[]' 0 ok > "$FIX/bench.json"
check "A7 slower clean -> keep"         0 "not faster"            run_bc
mk null 34.0 '[]' 0 ok > "$FIX/bench.json"
check "A8 no heap stamp -> refuse"      0 "unknown provenance"    run_bc
# faster AND clean, but measuring different work — must NOT adopt
mk 8 34.0 '[]' 0 ok /x q99 > "$FIX/bench.json"
check "A10 entry-set mismatch -> keep"  0 "INCOMPARABLE.*extra entries" run_bc
mk 8 34.0 '[]' 0 ok /other-sf > "$FIX/bench.json"
check "A11 sf mismatch -> keep"         0 "INCOMPARABLE.*sf"      run_bc
# trailing-slash drift names the SAME data — must still adopt, not refuse
mk 8 34.0 '[]' 0 ok /x/ > "$FIX/bench.json"
check "A12 sf slash drift -> ADOPT"     2 "SHOULD become"         run_bc
mk 89 40.0 '[]' 0 ok > "$FIX/bench.json"
git -C "$FIX" add bench.json && git -C "$FIX" commit -qm oops-driver-refresh
check "A9 committed is refresh -> 3"    3 "COMMITTED file is not a valid canonical" run_bc

# ---------- B. recall_audit decision paths, both interpreters ----------
AUDIT_PY="$TMP/audit_case.py"
cat > "$AUDIT_PY" <<EOF
import sys
sys.path.insert(0, "$REPO/tools")
from golden_ext import recall_audit
case = sys.argv[1]
# two near-identical docs (true 5-gram jaccard ~0.97) + one unrelated
A = "the quick brown fox jumps over the lazy dog again and again ok"
docs = [(1, A), (2, A + " x"), (3, "completely different text body here")]
full = {(1, 2): 0.97}
# explicit raises, not assert — this harness must itself survive -O
if case == "ok":
    rec = recall_audit(docs, full)
    if not rec.startswith("ok 1 "):
        raise SystemExit(f"bad ok record: {rec}")
elif case == "missed":
    recall_audit(docs, {})          # candidate list lost the true pair
elif case == "refuse":
    recall_audit(docs, full, flop_cap=1)
elif case == "skip":
    rec = recall_audit(docs, full, flop_cap=1, allow_skip=True)
    if not rec.startswith("skipped"):
        raise SystemExit(f"bad skip record: {rec}")
elif case == "brute_ok":
    from golden_ext import brute_recall_verify
    rec = brute_recall_verify(docs, full)
    if not (rec and rec.startswith("brute-verified at n=3")):
        raise SystemExit(f"bad brute record: {rec}")
elif case == "brute_missed":
    from golden_ext import brute_recall_verify
    brute_recall_verify(docs, {})   # independent leg must catch it too
elif case == "brute_at_scale":
    from golden_ext import brute_recall_verify
    # r19: past max_docs the leg SAMPLES (md5-of-id selection) instead
    # of standing down; sha256-derived texts are pairwise gram-disjoint
    # (hex 5-grams from a 16^5 space), so an empty candidate map is
    # still a clean run, labeled as a sample
    import hashlib
    docs601 = [(i, " ".join(hashlib.sha256(str(i).encode()).hexdigest()
                            [k:k + 8] for k in range(0, 64, 8)))
               for i in range(601)]
    rec = brute_recall_verify(docs601, {}, sample_n=50)
    if not (rec and rec.startswith("brute-verified at sample 50 of n=601")):
        raise SystemExit(f"bad sampled brute record: {rec}")
elif case == "brute_scale_missed":
    from golden_ext import brute_recall_verify
    # identical docs: every sampled pair is true at jaccard 1.0 — the
    # SAMPLED miss branch must fire exactly like the whole-corpus one
    brute_recall_verify([(i, "same text " * 30) for i in range(601)], {},
                        sample_n=10)
print("CASE_DONE")
EOF
for PY in "python3" "python3 -O"; do
  tag="[$PY]"
  check "B1 $tag ok path"        0 "CASE_DONE"  $PY "$AUDIT_PY" ok
  check "B2 $tag missed -> die"  1 "MISSED"     $PY "$AUDIT_PY" missed
  check "B3 $tag refuse skip"    1 "REFUSING"   $PY "$AUDIT_PY" refuse
  check "B4 $tag allowed skip"   0 "CASE_DONE"  $PY "$AUDIT_PY" skip
  check "B5 $tag brute ok"       0 "CASE_DONE"  $PY "$AUDIT_PY" brute_ok
  check "B6 $tag brute missed"   1 "MISSED"     $PY "$AUDIT_PY" brute_missed
  check "B7 $tag brute at scale" 0 "CASE_DONE"  $PY "$AUDIT_PY" brute_at_scale
  check "B8 $tag brute at scale missed" 1 "MISSED" $PY "$AUDIT_PY" brute_scale_missed
done

# ---------- C. end-to-end flop-cap hook on the real generator ----------
SF="${GRAFT_SELFTEST_SF:-/root/testdata/sf0.001}"
if [ -d "$SF" ]; then
  G1="$TMP/goldens_die"; G2="$TMP/goldens_skip"
  check "C1 capped main -> dies"  1 "REFUSING" \
    env GRAFT_AUDIT_FLOP_CAP=1 python3 tools/golden_ext.py "$SF" "$G1"
  # fail-closed means NOTHING was written — no partial goldens, no record
  leftover=$(ls "$G1" 2>/dev/null | wc -l)
  if [ "$leftover" != 0 ]; then
    echo "FAIL C2: capped run left $leftover files in $G1"; exit 1
  fi
  PASS=$((PASS + 1)); echo "ok   C2 capped run wrote nothing"
  check "C3 explicit skip -> runs" 0 "allow-audit-skip" \
    env GRAFT_AUDIT_FLOP_CAP=1 python3 tools/golden_ext.py "$SF" "$G2" --allow-audit-skip
  grep -q "skipped" "$G2/recall_audit.txt" || {
    echo "FAIL C4: skip record not in recall_audit.txt"; exit 1; }
  PASS=$((PASS + 1)); echo "ok   C4 skip recorded in recall_audit.txt"
else
  echo "skip C: $SF not present (set GRAFT_SELFTEST_SF)"
fi

# ---------- D. check_oracle.py flags every corruption class ----------
# The 151/151 gate is only as good as the comparator: write a synthetic
# outdir where d1 is byte-faithful and d2-d6 each carry exactly one
# corruption (value, row count, physical type, column name, missing
# output); the comparator must pass d1, name each failure class, and
# exit nonzero.
if [ -d "$SF" ]; then
  OD="$TMP/oracle_case"
  python3 - "$SF" "$OD" <<'EOF'
import duckdb, pyarrow as pa, pyarrow.parquet as pq, pyarrow.compute as pc
import json, os, sys
sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute(f"CREATE VIEW region AS SELECT * FROM '{sf}/region.parquet'")
base = con.execute(
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
).fetch_arrow_table()
sqls, SQL = {}, "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
def put(name, table):
    os.makedirs(f"{out}/{name}", exist_ok=True)
    if table is not None:
        pq.write_table(table, f"{out}/{name}/part-0.parquet")
    sqls[name] = SQL
put("d1_pass", base)
names = base.column("r_name").to_pylist(); names[0] = "CORRUPTED"
put("d2_value", base.set_column(1, "r_name",
    pa.array(names, type=base.schema.field("r_name").type)))
put("d3_rows", base.slice(0, base.num_rows - 1))
put("d4_types", base.set_column(0, "r_regionkey",
    pc.cast(base.column("r_regionkey"), pa.int16())))
put("d5_cols", base.rename_columns(["r_key", "r_name"]))
put("d6_missing", None)
json.dump(sqls, open(f"{out}/oracle_sql.json", "w"))
EOF
  rc=0; OUT_D="$(python3 tools/check_oracle.py "$OD" "$SF" 2>&1)" || rc=$?
  if [ "$rc" != 1 ]; then
    echo "FAIL D: check_oracle exit $rc, expected 1"; echo "$OUT_D"; exit 1
  fi
  for pat in "OK   d1_pass" "FAIL d2_value: values differ" \
             "FAIL d3_rows: rows oracle=" "FAIL d4_types: types oracle=" \
             "FAIL d5_cols: cols oracle=" "FAIL d6_missing: no spark output" \
             "1/6 pass"; do
    if ! echo "$OUT_D" | grep -qF "$pat"; then
      echo "FAIL D: output lacks '$pat'"; echo "$OUT_D"; exit 1
    fi
    PASS=$((PASS + 1)); echo "ok   D /$pat/"
  done
else
  echo "skip D: $SF not present (set GRAFT_SELFTEST_SF)"
fi

echo "selftest: $PASS checks pass"
