#!/bin/bash
# Per-query sf1 Verify driver: isolates hangs, logs per-query wall time.
cd "$(dirname "$0")/.."
SF=target/testdata/sf1
OUT=target/verify_sf1
LOG=target/sf1_verify_log.txt
: > $LOG
for q in $(tr ',' ' ' < target/sf1_queries.txt); do
  if [ -d "$OUT/$q" ] && [ -f "$OUT/$q/_SUCCESS" ]; then
    echo "$q cached" >> $LOG; continue
  fi
  t0=$(date +%s)
  SPARK_GRAFT_CPUS=32 timeout 900 tools/run.sh graft.Verify $SF $OUT "$q" > /dev/null 2>&1
  rc=$?
  t1=$(date +%s)
  echo "$q rc=$rc wall=$((t1-t0))s" >> $LOG
done
echo ALL-DONE >> $LOG
