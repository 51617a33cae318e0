#!/bin/bash
# Round-14 proof sweep (VERDICT r13 #6): the sf0.01 + sf0.1, plain-TZ
# + America/New_York driver-sim runs for every round-13 addition that
# commit 0179c93 claimed but never logged, plus the round-14 IVF-PQ
# pair. Claims live in logs, not commit messages.
set -u
KEYS="similarity_int8_ivf_topk similarity_int8_ivf_recall similarity_int8_pq_topk similarity_int8_pq_recall dedup_int8_embedding_pairs dedup_embedding_incremental similarity_knn_forget_compact similarity_int8_ivfpq_topk similarity_int8_ivfpq_recall similarity_graph_search_int8_topk similarity_graph_search_int8_recall"
for sf in /root/testdata/sf0.01 /root/testdata/sf0.1; do
  for tz in UTC America/New_York; do
    echo "=== SF=$sf TZ=$tz ==="
    TZ=$tz SPARK_GRAFT_SIM_SF=$sf python tools/driver_sim.py $KEYS 2>&1 | grep -aE "PASS|FAIL|ROWS_ONLY|done|entry"
  done
done
