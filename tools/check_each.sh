#!/bin/bash
# Per-query timed oracle check: runs tools/check.py one query at a time
# with a wall-clock budget each, so a super-linear oracle can't hang a
# big-SF sweep. Usage: tools/check_each.sh <sfDir> <outDir> [budget_s]
SF=$1; OUT=$2; BUDGET=${3:-600}
PASS=0; FAIL=0; TOUT=0
for q in $(python3 -c "import json;print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))"); do
  [ -d "$OUT/$q" ] || { echo "SKIP $q (no spark output)"; continue; }
  t0=$(date +%s)
  out=$(timeout "$BUDGET" python3 tools/check.py "$SF" "$OUT" "$q" 2>&1)
  rc=$?; t1=$(date +%s)
  line=$(echo "$out" | grep -E "^(PASS|FAIL)" | head -1)
  if [ $rc -eq 124 ]; then echo "TIMEOUT $q (${BUDGET}s)"; TOUT=$((TOUT+1))
  elif [ $rc -eq 0 ]; then echo "$line [$((t1-t0))s]"; PASS=$((PASS+1))
  else echo "$out" | grep -E "^FAIL|spark:|duck :" | head -8; echo "  ^ $q [$((t1-t0))s]"; FAIL=$((FAIL+1))
  fi
done
echo "== $PASS pass / $FAIL fail / $TOUT timeout =="
