#!/bin/bash
# Round-15 A/B, second pass: per-query isolation + alternating side
# order (odd reps HEAD first, even reps R13 first) so JVM-warmup and
# any decaying host state cancel. Nothing else runs during this.
set -u
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export SPARK_GRAFT_STREAM_REPS=1
export SPARK_GRAFT_BENCH_PROVENANCE=builder
for KEY in er_golden_records pipeline_near_dedup_keep_central; do
  export SPARK_GRAFT_BENCH_ONLY="$KEY"
  for i in 1 2 3 4; do
    if [ $((i % 2)) -eq 1 ]; then sides="HEAD R13"; else sides="R13 HEAD"; fi
    for side in $sides; do
      if [ "$side" = HEAD ]; then d=/root/repo; else d=/root/repo/.worktrees/r13; fi
      echo "=== key $KEY run $i side $side ==="
      (cd "$d" && python bench.py 2>/dev/null | tail -1)
    done
  done
done
