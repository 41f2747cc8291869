#!/bin/bash
# r17 verdict #4: the ingest/train scale decade — m1b_train_docs +
# s4_ingest / s4_sync_delta / s4_sync_steady at sf1 (50k docs) -> sf10
# (500k) -> sf100 (5M), 3 measured passes each, one artifact per sf.
# Serial by design: one bench at a time on a quiet host (bench hygiene).
set -euo pipefail
cd /root/repo
LEGS=m1b_train_docs,s4_ingest,s4_sync_delta,s4_sync_steady
for sf in 1 10 100; do
  docs=$((50000 * sf))
  dir=/tmp/graft_sf$sf
  if [ ! -d "$dir/documents.parquet" ]; then
    SPARK_DRIVER_MEM=16g sbt "runMain graft.GenData $dir $docs $docs 42" \
      < /dev/null > /tmp/gendata_sf$sf.log 2>&1
  fi
  SPARK_GRAFT_SF_DIR=$dir \
  SPARK_GRAFT_BENCH_QUERIES=$LEGS \
  SPARK_DRIVER_MEM=48g \
  SPARK_DRIVER_MAX_RESULT=8g \
  SPARK_GRAFT_BENCH_DETAIL=/root/repo/BENCH_ingest_sf${sf}_local.json \
    sbt "runMain graft.Bench" < /dev/null > /tmp/bench_ingest_sf$sf.log 2>&1
  echo "=== sf$sf done: $(date -u +%H:%M:%S)"
  tail -1 /root/repo/BENCH_ingest_sf${sf}_local.json | head -c 400; echo
done
