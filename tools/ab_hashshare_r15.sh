#!/bin/bash
# Round-15 optimization A/B: shared maintained LSH hash frame
# (lsh_hashed_frame + hashed_df injection) across build/seed/merge/
# compact stages, HEAD vs pre-change base (06baee6), interleaved
# worktree loop under the driver protocol.
set -u
KEYS="similarity_graph_search_int8_topk,similarity_graph_search_int8_recall,similarity_clustered_graph_recall,similarity_int8_knn_merge,similarity_int8_knn_forget,similarity_incremental_knn_merge,similarity_knn_forget_compact"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY="$KEYS"
export SPARK_GRAFT_STREAM_REPS=1
export SPARK_GRAFT_BENCH_PROVENANCE=builder
for i in 1 2 3; do
  for side in HEAD BASE; do
    if [ "$side" = HEAD ]; then d=/root/repo; else d=/root/repo/.worktrees/r15base; fi
    echo "=== run $i side $side ==="
    (cd "$d" && python bench.py 2>/dev/null | tail -1)
  done
done
