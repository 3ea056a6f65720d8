#!/bin/bash
# 10x-scale DuckDB oracle sweep (VERDICT r14 #6): the correctness gate
# at the sf1 replica, committed as CORRECTNESS_SF1.json. The r14 phash
# defect (distinct payloads collapsing onto 254 fingerprints) was caught
# exactly this way; this makes the catch systematic.
#
#   tools/run_oracle_sf1.sh [replica_dir] [outdir]
#
# Surface: FULL (VERDICT r16 #2) — every SparkEntry query with an
# oracle, discovered from the verify dump's oracle_sql.json rather
# than a hand-kept shelf list, so new rows join the sweep by existing.
# Every oracle runs under its own timeout (the 420 s per-oracle
# budget) so one heavy SQL cannot stall the sweep; a timeout records
# as "skipped_oracle_cost" with the budget named — an ADJUDICATED
# exclusion, never a silent pass. The heavy class is always the
# ORACLE's cost, not the engine's (DuckDB re-runs Lloyd folds,
# pairwise lambda scans, recursive CTE closures the engine expresses
# as bounded iterations).
set -e
REPLICA=${1:-/tmp/sf1}
OUT=${2:-/tmp/gv_sf1}
TIMEOUT_S=${TIMEOUT_S:-420}
cd /root/repo
if [ ! -d "$REPLICA" ]; then
  echo "[sf1] building 10x replica at $REPLICA"
  python3 tools/make_replica.py /root/testdata/sf0.1 "$REPLICA" 10
fi

echo "[sf1] full-surface verify dump"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} \
  tools/run_verify.sh "$REPLICA" "$OUT" 2>&1 | grep -iE "\[verify\].*failed" || true

ALL=$(python3 -c "import json; print(','.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")
echo "[sf1] oracle sweep over $(echo "$ALL" | tr ',' '\n' | wc -l) queries"

mkdir -p "$OUT/percheck"
for q in $(echo "$ALL" | tr ',' ' '); do
  t="$TIMEOUT_S"
  if CHECK_ONLY="$q" timeout "$t" \
      python3 tools/check_oracle.py "$REPLICA" "$OUT" "$OUT/percheck/$q.json" \
      > "$OUT/percheck/$q.log" 2>&1; then
    tail -2 "$OUT/percheck/$q.log" | head -1
  else
    rc=$?
    if [ "$rc" = 124 ]; then
      echo "SKIP $q: oracle exceeded ${t}s (skipped_oracle_cost)"
      echo "{\"sf\": \"$REPLICA\", \"n_pass\": 0, \"n_fail\": 0, \"queries\": {\"$q\": {\"status\": \"skipped_oracle_cost\", \"rows\": -1, \"detail\": \"oracle SQL exceeded ${t}s at 10x\"}}}" \
        > "$OUT/percheck/$q.json"
    else
      echo "FAIL $q: check exited $rc"
      head -5 "$OUT/percheck/$q.log"
    fi
  fi
done

python3 - "$OUT/percheck" CORRECTNESS_SF1.json "$REPLICA" <<'EOF'
import glob, json, sys
d, out, sf = sys.argv[1], sys.argv[2], sys.argv[3]
queries, npass, nfail, nskip = {}, 0, 0, 0
for p in sorted(glob.glob(f"{d}/*.json")):
    j = json.load(open(p))
    for k, v in j.get("queries", {}).items():
        queries[k] = v
        st = v["status"]
        if st.startswith("pass"): npass += 1
        elif st == "skipped_oracle_cost": nskip += 1
        else: nfail += 1
json.dump({"sf": sf, "n_pass": npass, "n_fail": nfail,
           "n_skipped_oracle_cost": nskip, "queries": queries},
          open(out, "w"), indent=1, sort_keys=True)
print(f"wrote {out}: {npass} pass, {nfail} fail, {nskip} skipped (oracle cost)")
EOF
