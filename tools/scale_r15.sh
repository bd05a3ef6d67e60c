#!/bin/bash
# SCALE_r15 runner: lifecycle + dedup + umap families at sf0.1 / sf1 /
# sf10, solo-forked (own JVM per query, uncounted warmup, two shuffled
# passes, per-query MIN), 8 cores — the SCALE_r13 method at the third
# decade. Outputs one Bench JSON per scale under plans/r15/.
set -e
QS="q_index_maint q_ivf_append q_ivfpq_append q_umap_ivf q_umap_analog q_dedup_ngram q_cc_components q_dup_clusters"
export SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_CHUNK=1 SPARK_GRAFT_BENCH_C8=0
export SPARK_DRIVER_MEM=16g
for pair in "sf0.1:/root/testdata/sf0.1" "sf1:/root/repo/.sf1_testdata" "sf10:/root/repo/.sf10_testdata"; do
  name="${pair%%:*}"; dir="${pair#*:}"
  echo "=== $name ($dir) ==="
  SPARK_GRAFT_SF_DIR="$dir" tools/run.sh graft.Bench $QS 2>/dev/null \
    | grep '"metric"' | head -1 > "plans/r15/scale_${name}.json"
  tail -c 400 "plans/r15/scale_${name}.json"; echo
done
