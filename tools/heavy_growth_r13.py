"""Round-13 super-sf0.1 growth measurement (round-12 verdict #5).

The heavy tier's only super-linear-risk surface is the DuckDB SQL
replay of the MinHash oracles (104-166s at sf0.1) plus the suffix-span
pipeline. This script builds a THROWAWAY 3x documents fixture —
3 structure-identical replicas of sf0.1's documents with DISJOINT
per-replica vocabularies (every word suffixed with the replica id), so
the near-dup pair structure replicates exactly linearly and no
cross-replica shingle ever collides — then times each query's Spark
side and DuckDB oracle side at 1x and 3x and prints a growth-ratio
table. NOTE the prediction is NOT flat 3x for the banded operators:
length-band blocking is absolute-width, so bucket occupancy (and the
exact-Jaccard verification join) grows with corpus DENSITY — the
docstring claim is O(n * bucket_width), i.e. ~m^2 = 9x verification
at m = 3x data over a fixed length range, on top of the ~3x linear
shingle-hashing cost. This is equally true of a real sf0.3: the fix
at scale is the documented band/stride dial, and this measurement is
the evidence for when to turn it.

Run: python tools/heavy_growth_r13.py > tools/heavy_growth_r13.log 2>&1
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
WORK = "/tmp/sf0.3x_growth"
REPLICAS = 3
QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_recall",
    "dedup_minhash_estimate_audit",
    "dedup_span_floor_profile",
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
    # replica k: doc_id += k*10_000_000, every word suffixed with _rk
    # (k=0 keeps the original text so 1x is a strict subset), n_chars
    # recomputed (the length-band blocking reads it).
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
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{BASE}/{t}.parquet", f"{WORK}/{t}.parquet")
    n = con.execute(
        f"SELECT count(*) FROM '{WORK}/documents.parquet'"
    ).fetchone()[0]
    print(f"fixture: {n} docs at {WORK}", flush=True)


def time_spark(spark, name, sf_dir):
    from msk_flink_streaming_cdk_spark.registry import QUERIES as Q

    t0 = time.monotonic()
    n = Q[name](spark, sf_dir).count()
    return time.monotonic() - t0, n


def time_oracle(name, sf_dir):
    from msk_flink_streaming_cdk_spark.registry import ORACLES

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
    for name in QUERIES:
        s1, n1 = time_spark(spark, name, BASE)
        print(f"  [{name}] spark 1x {s1:.1f}s", flush=True)
        s5, n5 = time_spark(spark, name, WORK)
        print(f"  [{name}] spark 3x {s5:.1f}s", flush=True)
        o1, on1 = time_oracle(name, BASE)
        print(f"  [{name}] oracle 1x {o1:.1f}s", flush=True)
        o5, on5 = time_oracle(name, WORK)
        rows.append((name, s1, s5, o1, o5, n1, n5, on1, on5))
        print(
            f"[{name}] spark {s1:.1f}s -> {s5:.1f}s "
            f"(x{s5 / s1:.2f}); oracle {o1:.1f}s -> {o5:.1f}s "
            f"(x{o5 / o1:.2f}); rows {n1}->{n5} / {on1}->{on5}",
            flush=True,
        )
    print("\n== growth-ratio table (3x data; linear prediction 3.0, banded-verify prediction ~9x candidates) ==")
    print(
        f"{'query':38s} {'spark_1x':>8s} {'spark_3x':>8s} {'ratio':>6s} "
        f"{'ora_1x':>7s} {'ora_3x':>7s} {'ratio':>6s} verdict"
    )
    for name, s1, s5, o1, o5, *_ in rows:
        rs, ro = s5 / s1, o5 / o1
        verdict = (
            "SUPER-QUADRATIC"
            if max(rs, ro) > 13.5  # 1.5x headroom over the m^2 bound
            else ("~m^2-banded" if max(rs, ro) > 4.5 else "~linear")
        )
        print(
            f"{name:38s} {s1:8.1f} {s5:8.1f} {rs:6.2f} "
            f"{o1:7.1f} {o5:7.1f} {ro:6.2f} {verdict}"
        )
    shutil.rmtree(WORK)
    print("\nfixture removed; done")


if __name__ == "__main__":
    main()
