#!/bin/bash
# Per-query DuckDB oracle compare for a scaled testdata dir, with a
# per-oracle time budget (ORACLE-TIMEOUT = Spark produced a result,
# the DuckDB replay exceeded the budget). Generalizes sf1_check.sh.
# Usage: tools/sfn_check.sh <sfDir> <outDir> <queriesFile> [timeoutSec]
cd "$(dirname "$0")/.."
SF=$1
OUT=$2
QFILE=$3
TMO=${4:-1800}
LOG=$OUT.check_log.txt
: > $LOG
for q in $(tr ',' ' ' < $QFILE); do
  t0=$(date +%s)
  res=$(timeout $TMO python3 tools/check.py $OUT $SF "$q" 2>&1 | grep -E "^(PASS|FAIL|SKIP)" | head -1)
  t1=$(date +%s)
  if [ -z "$res" ]; then res="ORACLE-TIMEOUT"; fi
  echo "$q $res oracle_wall=$((t1-t0))s" >> $LOG
done
echo ALL-DONE >> $LOG
