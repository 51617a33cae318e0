"""Round-15 10x growth measurement (round-14 verdict #4).

The 3x probes (r13 dedup, r14 ANN) were the only super-sf0.1 data
points, and 3x is too small to separate n·log n from n^1.5: at 3x,
linear predicts 3.0, n·log n ~3.4, n^1.5 ~5.2 — inside run noise for
second-scale queries. At 10x the bands separate cleanly: linear 10,
n·log n ~13.3, n^1.5 ~31.6.

Probe set = the five most expensive committed-record queries (the
r14 verdict's plan-audit list):

- ``similarity_knn_forget_compact``  — equality audit: TWO NN-Descent
  graph builds (compacted == rebuild-after-delete). k·n edges,
  bounded rounds -> ~linear prediction.
- ``similarity_nnd_recall``          — graph build + per-query
  brute-force top-5 baseline (fixed |Q|, n candidates) -> ~linear.
- ``dedup_span_floor_profile``       — per-floor gram classes;
  sort/hash of ~n·T grams -> ~n·log n prediction (the r14 3x probe
  measured spark x1.09 / oracle x5.66 at trivial absolute cost).
- ``similarity_int8_knn_forget``     — ghost-free compaction audit
  with a DuckDB survivors-rebuild twin -> ~linear.
- ``similarity_graph_search_recall`` — beam search (fixed probes)
  + brute-force baseline -> ~linear.

Corpus recipe = the r14 throwaway fixture scaled to 10 replicas,
with one fix: the r14 parity sign-flip ((i+k)%2) only yields two
distinct isometries, so at 10 replicas the even replicas would be
EXACT copies of each other and candidate structure would collapse.
Replica k>0 instead flips dimension i iff md5('gp:k:i') is even —
a per-replica random-sign isometry (norms and intra-replica dot
products preserved, cross-replica correlations ~0), md5-derived so
the fixture stays deterministic. Documents get the r13/r14 disjoint
vocabulary suffix (word -> word_rk), which is already k-generic.
The query sets (vec_id < 10 / replica-0 docs) stay fixed-size.

Run: python tools/heavy_growth_r15.py > tools/heavy_growth_r15.log 2>&1
"""

import hashlib
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/sf1.0x_growth_r15"
REPLICAS = 10
HEAVY = [
    "dedup_span_floor_profile",
    "similarity_nnd_recall",
    "similarity_graph_search_recall",
    "similarity_int8_knn_forget",
    "similarity_knn_forget_compact",
]
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def build_fixture():
    if os.path.exists(WORK):
        shutil.rmtree(WORK)
    os.makedirs(WORK)
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT d.doc_id + r.k * 10000000 AS doc_id,
                 CASE WHEN r.k = 0 THEN d.text
                      ELSE array_to_string(
                             list_transform(
                               string_split(d.text, ' '),
                               w -> w || '_r' || CAST(r.k AS VARCHAR)),
                             ' ')
                 END AS text,
                 d.lang, d.source,
                 CAST(CASE WHEN r.k = 0 THEN d.n_chars
                      ELSE length(array_to_string(
                             list_transform(
                               string_split(d.text, ' '),
                               w -> w || '_r' || CAST(r.k AS VARCHAR)),
                             ' '))
                 END AS BIGINT) AS n_chars
          FROM '{BASE}/documents.parquet' d
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS k) r
        ) TO '{WORK}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # Per-replica md5 random-sign isometry (see module docstring).
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.k * 10000000 AS vec_id,
                 CASE WHEN r.k = 0 THEN e.embedding
                      ELSE CAST(list_transform(e.embedding,
                        (x, i) -> x * CASE WHEN
                          ('0x' || substr(md5('gp:' || CAST(r.k AS VARCHAR)
                             || ':' || CAST(i AS VARCHAR)), 1, 2))::INT
                          % 2 = 0 THEN -1 ELSE 1 END)
                           AS FLOAT[])
                 END AS embedding,
                 e.label
          FROM '{BASE}/embeddings.parquet' e
          CROSS JOIN (SELECT unnest(range({REPLICAS})) AS k) r
        ) TO '{WORK}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        if t not in ("documents", "embeddings"):
            os.symlink(f"{BASE}/{t}.parquet", f"{WORK}/{t}.parquet")
    nd = con.execute(
        f"SELECT count(*) FROM '{WORK}/documents.parquet'"
    ).fetchone()[0]
    ne = con.execute(
        f"SELECT count(*) FROM '{WORK}/embeddings.parquet'"
    ).fetchone()[0]
    print(f"fixture: {nd} docs / {ne} vecs at {WORK}", flush=True)


def time_spark(spark, name, sf_dir):
    from msk_flink_streaming_cdk_spark.registry import QUERIES as Q

    t0 = time.monotonic()
    n = Q[name](spark, sf_dir).count()
    return time.monotonic() - t0, n


def time_oracle(name, sf_dir):
    from msk_flink_streaming_cdk_spark.registry import ORACLES

    if name not in ORACLES:
        return None, None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    t0 = time.monotonic()
    n = len(con.execute(ORACLES[name]).fetchall())
    return time.monotonic() - t0, n


def main():
    # argv names override the probe set (post-fix re-measurement of a
    # specific query: python tools/heavy_growth_r15.py <name> ...)
    probe = sys.argv[1:] or HEAVY
    build_fixture()
    from msk_flink_streaming_cdk_spark import session

    spark = session.get_spark()
    rows = []
    for name in probe:
        s1, n1 = time_spark(spark, name, BASE)
        print(f"  [{name}] spark  1x {s1:.1f}s ({n1} rows)", flush=True)
        s10, n10 = time_spark(spark, name, WORK)
        print(f"  [{name}] spark 10x {s10:.1f}s ({n10} rows)", flush=True)
        o1, on1 = time_oracle(name, BASE)
        if o1 is not None:
            print(f"  [{name}] oracle  1x {o1:.1f}s", flush=True)
            o10, on10 = time_oracle(name, WORK)
            print(f"  [{name}] oracle 10x {o10:.1f}s", flush=True)
        else:
            o10, on10 = None, None
        rows.append((name, s1, s10, o1, o10, n1, n10, on1, on10))
    print(
        "\n== growth-ratio table (10x data; linear 10.0, n·log n ~13.3, "
        "n^1.5 ~31.6) =="
    )
    print(
        f"{'query':36s} {'sp_1x':>7s} {'sp_10x':>7s} {'ratio':>6s} "
        f"{'or_1x':>7s} {'or_10x':>7s} {'ratio':>6s} verdict"
    )
    for name, s1, s10, o1, o10, *_ in rows:
        rs = s10 / s1
        ro = o10 / o1 if o1 else float("nan")
        worst = max(rs, ro) if o1 else rs
        verdict = (
            "~n^1.5-or-worse"
            if worst > 25
            else ("~n·log n band" if worst > 14 else "~linear")
        )
        ocols = (
            f"{o1:7.1f} {o10:7.1f} {ro:6.2f}"
            if o1 is not None
            else f"{'-':>7s} {'-':>7s} {'-':>6s}"
        )
        print(f"{name:36s} {s1:7.1f} {s10:7.1f} {rs:6.2f} {ocols} {verdict}")
    shutil.rmtree(WORK)
    print("\nfixture removed; done")


if __name__ == "__main__":
    main()


# Keep hashlib import honest (fixture signs are computed in DuckDB;
# this mirror is only for doc examples / interactive checks).
def _flip_sign(k: int, i: int) -> int:
    return -1 if int(hashlib.md5(f"gp:{k}:{i}".encode()).hexdigest()[:2], 16) % 2 == 0 else 1
