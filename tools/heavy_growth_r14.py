"""Round-14 super-sf0.1 growth measurement (round-13 verdict #4+#5).

Two questions, one 3x structure-identical corpus each:

1. Did the round-14 inverted-index pairs CTE kill the banded-verify
   m^2 term? The r13 probe measured x4.6-4.7 on the MinHash
   recall/audit replays because the old length-bucket join's
   occupancy densified with the corpus. The token join is
   content-anchored: the 3x documents fixture gives each replica a
   DISJOINT vocabulary (every word suffixed with the replica id), so
   cross-replica shingles never match and candidate volume is
   exactly 3x. Prediction: all three MinHash replays drop to the
   ~linear band (<= ~3.5-4, the residual being the per-shingle hash
   chains' superlinear hash-table constants).

2. What does the ANN family's growth actually measure (r13 verdict
   #5 — similarity is 40% of the committed suite record and never
   had a growth row)? The 3x embeddings fixture sign-flips a
   replica-specific half of the dimensions (an isometry within each
   replica, decorrelated across replicas) and keeps the 10-query
   set fixed (vec_id < 10 selects only replica-0 rows). Predictions
   with the registry defaults (fixed bits/lists/m):
   - int8-LSH topk: candidates = |Q| x occupancy x probes; occupancy
     grows 3x at fixed 6 bits -> ~3x (linear; the documented dial is
     bits ~ log n, see _auto_bits).
   - int8-IVF topk: candidates = |Q| x n_probe x n/n_lists -> ~3x.
   - int8-PQ topk: flat ADC scans ALL n codes per query -> ~3x with
     the LARGEST absolute slope of the family.
   - int8-IVFPQ topk: ADC scans only the probed n_probe/n_lists
     fraction -> ~3x ratio but ~1/4 the flat-PQ slope — the reason
     the composition exists (Jegou et al. IVFADC; PAPERS.md).
   - NN-Descent build (similarity_nnd_recall): k·n edges, bounded
     rounds -> ~3x modulo the fixed-size brute-force recall audit.

Run: python tools/heavy_growth_r14.py > tools/heavy_growth_r14.log 2>&1
"""

import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/sf0.3x_growth_r14"
REPLICAS = 3
REPLAYS = [
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_recall",
    "dedup_minhash_estimate_audit",
    "dedup_span_floor_profile",
]
ANN = [
    "similarity_int8_lsh_topk",
    "similarity_int8_ivf_topk",
    "similarity_int8_pq_topk",
    "similarity_int8_ivfpq_topk",
    "similarity_nnd_recall",
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
    # documents: replica k appends _rk to every word (disjoint
    # vocabularies; k=0 keeps the original text so 1x is a strict
    # subset), n_chars recomputed.
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
    # embeddings: replica k sign-flips dimensions where (i+k) is even
    # for k > 0 — an isometry within the replica (intra-replica dot
    # products unchanged), decorrelated across replicas; the 10-query
    # set (vec_id < 10) stays replica-0 only.
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.k * 10000000 AS vec_id,
                 CASE WHEN r.k = 0 THEN e.embedding
                      ELSE CAST(list_transform(e.embedding,
                        (x, i) -> x * CASE WHEN (i + r.k) % 2 = 0
                                           THEN -1 ELSE 1 END)
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
    build_fixture()
    from msk_flink_streaming_cdk_spark import session

    spark = session.get_spark()
    rows = []
    for name in REPLAYS + ANN:
        s1, n1 = time_spark(spark, name, BASE)
        print(f"  [{name}] spark 1x {s1:.1f}s", flush=True)
        s5, n5 = time_spark(spark, name, WORK)
        print(f"  [{name}] spark 3x {s5:.1f}s", flush=True)
        o1, on1 = time_oracle(name, BASE)
        if o1 is not None:
            print(f"  [{name}] oracle 1x {o1:.1f}s", flush=True)
            o5, on5 = time_oracle(name, WORK)
        else:
            o5, on5 = None, None
        rows.append((name, s1, s5, o1, o5, n1, n5, on1, on5))
        otxt = (
            f"oracle {o1:.1f}s -> {o5:.1f}s (x{o5 / o1:.2f}); "
            if o1 is not None
            else "oracle: none (rows-only); "
        )
        print(
            f"[{name}] spark {s1:.1f}s -> {s5:.1f}s "
            f"(x{s5 / s1:.2f}); {otxt}rows {n1}->{n5} / {on1}->{on5}",
            flush=True,
        )
    print(
        "\n== growth-ratio table (3x data; linear prediction 3.0; "
        "r13 banded-verify baseline was x4.6-4.7) =="
    )
    print(
        f"{'query':38s} {'spark_1x':>8s} {'spark_3x':>8s} {'ratio':>6s} "
        f"{'ora_1x':>7s} {'ora_3x':>7s} {'ratio':>6s} verdict"
    )
    for name, s1, s5, o1, o5, *_ in rows:
        rs = s5 / s1
        ro = o5 / o1 if o1 else float("nan")
        worst = max(rs, ro) if o1 else rs
        verdict = (
            "SUPER-QUADRATIC"
            if worst > 13.5
            else ("~m^2-banded" if worst > 4.5 else "~linear")
        )
        ocols = (
            f"{o1:7.1f} {o5:7.1f} {ro:6.2f}"
            if o1 is not None
            else f"{'-':>7s} {'-':>7s} {'-':>6s}"
        )
        print(f"{name:38s} {s1:8.1f} {s5:8.1f} {rs:6.2f} {ocols} {verdict}")
    shutil.rmtree(WORK)
    print("\nfixture removed; done")


if __name__ == "__main__":
    main()
