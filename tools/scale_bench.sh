#!/bin/bash
# Scale-decade bench runner: one graft.Bench invocation over a generated
# corpus dir, corpus-proportional legs only, full detail JSON committed.
#   tools/scale_bench.sh /tmp/graft_sf100 BENCH_sf100_local.json [legs] [mem]
set -e
DIR=$1
OUT=$2
LEGS=${3:-d1_minhash_lsh_pairs,d2_simhash_pairs,d3_dedup_groups,d6_dedup_against,c6_perplexity,c9_ngram_lm,s7_hybrid_search,v9c_hnsw_local}
MEM=${4:-8g}
cd /root/repo
SPARK_GRAFT_SF_DIR=$DIR \
SPARK_GRAFT_BENCH_QUERIES=$LEGS \
SPARK_GRAFT_BENCH_DETAIL=/tmp/graft_bench_detail_scale.json \
SPARK_DRIVER_MEM=$MEM \
sbt -batch "runMain graft.Bench" 2>&1 | tee /tmp/scale_bench_last.log | tail -3
cp /tmp/graft_bench_detail_scale.json "$OUT"
echo "wrote $OUT"
