#!/bin/bash
# Round-15 A/B of the three sub-2x vs_prev watch rows (VERDICT r14 #3):
# er_golden_records (x1.37), pipeline_near_dedup_keep_central (x1.29),
# dedup_span_floor_profile (x1.18). The per-query runs_considered artifact
# shows all five r14 runs elevated consistently (no single-run burst), so
# the artifact alone cannot adjudicate — interleaved HEAD-vs-r13-worktree
# subset runs under the driver protocol decide code-vs-host.
set -u
KEYS="er_golden_records,pipeline_near_dedup_keep_central,dedup_span_floor_profile"
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_BENCH_ONLY="$KEYS"
export SPARK_GRAFT_STREAM_REPS=1
export SPARK_GRAFT_BENCH_PROVENANCE=builder
for i in 1 2 3; do
  for side in HEAD R13; do
    if [ "$side" = HEAD ]; then d=/root/repo; else d=/root/repo/.worktrees/r13; fi
    echo "=== run $i side $side ==="
    (cd "$d" && python bench.py 2>/dev/null | tail -1)
  done
done
