#!/bin/bash
# Per-query DuckDB oracle compare at sf1 with a per-oracle time budget:
# isolates the (known) heavy recursive/self-join oracles so one slow
# replay cannot stall the whole scaling sweep. ORACLE-TIMEOUT records
# "Spark produced a result; the DuckDB replay exceeded the budget".
cd "$(dirname "$0")/.."
LOG=target/sf1_check_log.txt
: > $LOG
for q in $(tr ',' ' ' < target/sf1_queries.txt); do
  t0=$(date +%s)
  res=$(timeout 600 python3 tools/check.py target/verify_sf1 target/testdata/sf1 "$q" 2>&1 | grep -E "^(PASS|FAIL|SKIP)" | head -1)
  t1=$(date +%s)
  if [ -z "$res" ]; then res="ORACLE-TIMEOUT"; fi
  echo "$q $res oracle_wall=$((t1-t0))s" >> $LOG
done
echo ALL-DONE >> $LOG
