#!/bin/bash
# Round-15 optimization A/B: fused IVF-PQ quantizer-training pick
# (one lanes job instead of centroid TakeOrdered + lanes) and the
# lazy NN-Descent round checkpoints, HEAD vs pre-change base
# (06baee6) in an interleaved worktree loop under the driver
# protocol.
set -u
KEYS="similarity_int8_ivfpq_topk,similarity_int8_ivfpq_recall,similarity_int8_ivfpq_incremental,similarity_int8_ivfpq_drift,similarity_clustered_ivfpq_recall,similarity_nnd_recall"
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
