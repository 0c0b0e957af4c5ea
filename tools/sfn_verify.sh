#!/bin/bash
# Per-query Verify driver for a scaled testdata dir: isolates hangs,
# logs per-query wall time. Generalizes sf1_verify.sh to any SF.
# Usage: tools/sfn_verify.sh <sfDir> <outDir> <queriesFile> [timeoutSec]
cd "$(dirname "$0")/.."
SF=$1
OUT=$2
QFILE=$3
TMO=${4:-1800}
LOG=$OUT.verify_log.txt
: > $LOG
for q in $(tr ',' ' ' < $QFILE); do
  if [ -d "$OUT/$q" ] && [ -f "$OUT/$q/_SUCCESS" ]; then
    echo "$q cached" >> $LOG; continue
  fi
  t0=$(date +%s)
  SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g timeout $TMO tools/run.sh graft.Verify $SF $OUT "$q" > /dev/null 2>&1
  rc=$?
  t1=$(date +%s)
  echo "$q rc=$rc wall=$((t1-t0))s" >> $LOG
done
echo ALL-DONE >> $LOG
