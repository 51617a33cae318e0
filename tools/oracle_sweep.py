"""Driver-style correctness sweep: every oracle-backed registered query
vs DuckDB at an arbitrary SF (default sf0.01 — the driver's gate scale).

Usage: python tools/oracle_sweep.py [sf_dir] [name_substring ...]
       python tools/oracle_sweep.py sf_dir --skip-heavy
       python tools/oracle_sweep.py sf_dir --only-heavy

Prints one line per query (ok / MISMATCH / ERR) and a summary; exits
non-zero on any failure so it can gate commits.

``--skip-heavy`` excludes the recursive-closure / unrolled-iteration
oracles (``HEAVY_ORACLES``): DuckDB re-evaluates a CTE per reference,
so those replays are quadratic-plus above oracle scale — they stay
gated at sf0.001 (pytest) and sf0.01 (driver). With the flag, the
remaining 186 oracles were verified green at sf0.1 in round 6.

``--only-heavy`` runs JUST the recursive/closure oracles — the
round-7 verdict's item 7: scale-dependent fixpoint bugs (an iteration
count that converges at sf0.01 but not sf0.1, a tie-break that only
ties at scale) are invisible to the sf0.01 driver gate, so this runs
once per round at sf0.1 (log committed as tools/heavy_sweep_r{N}.log).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["TZ"] = "UTC"
time.tzset()

from msk_flink_streaming_cdk_spark.registry import ORACLES, QUERIES
from msk_flink_streaming_cdk_spark.session import get_spark
from tests.oracle import compare


HEAVY_ORACLES = {
    # not recursive, but the MinHash replay hashes every (shingle x
    # 16 permutations) row through the mod-2^64 SQL chain — linear,
    # with a ~10x-vs-Spark constant that matters at 5000 docs.
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_recall",
    "dedup_minhash_estimate_audit",
    # iterative peeling closure: 1004s at sf0.1 in the round-12 full
    # sweep (every other non-heavy row <= 216s, dominated by the
    # shared linear exact-pair base).
    "graph_kcore_mirror_clusters",
    "dedup_graph_pagerank",
    "dedup_connected_components",
    "dedup_connected_components_star",
    "pipeline_near_dedup_keep_central",
    "pipeline_forget_expand",
    "graph_label_propagation",
    "er_golden_records",
    "similarity_mmr_diversified",
    "dedup_incremental_components",
    "dedup_cluster_stats",
    "embedding_kmeans_lloyd2",
    "quality_logistic_fit",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    subs = [
        a
        for a in sys.argv[2:]
        if a not in ("--skip-heavy", "--only-heavy")
    ]
    skip_heavy = "--skip-heavy" in sys.argv[2:]
    only_heavy = "--only-heavy" in sys.argv[2:]
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")))
    names = [
        n
        for n in sorted(QUERIES)
        if n in ORACLES
        and (not subs or any(s in n for s in subs))
        and not (skip_heavy and n in HEAVY_ORACLES)
        and not (only_heavy and n not in HEAVY_ORACLES)
    ]
    failed = []
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            compare(QUERIES[name](spark, sf_dir), ORACLES[name], sf_dir)
            print(f"[{i}/{len(names)}] ok   {name} ({time.time()-t0:.1f}s)", flush=True)
        except Exception as exc:
            failed.append(name)
            kind = "ERR " if not isinstance(exc, AssertionError) else "FAIL"
            print(f"[{i}/{len(names)}] {kind} {name}: {exc}", flush=True)
            if kind == "ERR ":
                traceback.print_exc()
    print(f"\n{len(names) - len(failed)}/{len(names)} green at {sf_dir}")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
