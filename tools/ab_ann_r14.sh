#!/bin/bash
# Round-14 A/B of the five ANN vs_prev watch rows (VERDICT r13 #2):
# alternating HEAD-vs-r12-worktree subset bench runs under the exact
# driver protocol (SPARK_GRAFT_BENCH_ONLY; subset runs do not touch
# BENCH_FULL.json). 3 runs per side, interleaved to share any host
# burst equally.
set -u
KEYS="similarity_int8_lsh_topk,similarity_int8_lsh_recall,similarity_ivf_ann_topk,similarity_ivf_recall,similarity_incremental_knn_merge"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY="$KEYS"
export SPARK_GRAFT_STREAM_REPS=1
export SPARK_GRAFT_BENCH_PROVENANCE=builder
for i in 1 2 3; do
  for side in HEAD R12; do
    if [ "$side" = HEAD ]; then d=/root/repo; else d=/root/repo/.worktrees/r12; fi
    echo "=== run $i side $side ==="
    (cd "$d" && python bench.py 2>/dev/null | tail -1)
  done
done
