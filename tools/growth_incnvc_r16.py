"""Round-16 growth probe for ``incremental_near_dup`` blocking
(VERDICT r15 #2): the r15 inverted-index token join regressed the
LOCAL bench ~1.9x at both driver core counts while being the right
100 TB shape. This probe measures BOTH blocking forms (the round-6
log2-length-bucket probe join and the r15 token join) on disjoint-
vocabulary corpus replicas at 1x / 3x / 10x sf0.1 to place the
crossover that justifies a size-gated hybrid: replicas share no
shingles (word -> word_rk suffix), so token-join candidates stay
~linear, while every replica has the SAME length profile, so the
length-bucket occupancy densifies and the probe join's candidate
count grows ~m^2.

Run: python tools/growth_incnvc_r16.py > tools/growth_incnvc_r16.log 2>&1
"""

import math
import os
import shutil
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb

BASE = "/root/testdata/sf0.1"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def build_fixture(replicas: int) -> str:
    work = f"/tmp/growth_incnvc_r16_{replicas}x"
    if os.path.exists(work):
        shutil.rmtree(work)
    os.makedirs(work)
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
          CROSS JOIN (SELECT unnest(range({replicas})) AS k) r
        ) TO '{work}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{BASE}/{t}.parquet", f"{work}/{t}.parquet")
    n = con.execute(
        f"SELECT count(*) FROM '{work}/documents.parquet'"
    ).fetchone()[0]
    print(f"{replicas}x fixture: {n} docs at {work}", flush=True)
    return work


def main() -> None:
    from pyspark.sql import functions as F

    from msk_flink_streaming_cdk_spark.operators.dedup import (
        incremental_near_dup,
    )
    from msk_flink_streaming_cdk_spark.registry.llm_q import _docs
    from msk_flink_streaming_cdk_spark.session import get_spark

    spark = get_spark(
        app_name="growth-incnvc-r16",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(form: str, sf_dir: str) -> tuple[float, int]:
        docs = _docs(spark, sf_dir)
        df = incremental_near_dup(
            docs.filter(F.col("doc_id") % 5 != 0),
            docs.filter(F.col("doc_id") % 5 == 0),
            threshold=0.5,
            blocking=form,
        )
        t0 = time.monotonic()
        n = df.count()
        return time.monotonic() - t0, n

    for replicas in (1, 3, 10):
        work = build_fixture(replicas)
        for rep in range(2):
            for form in ("probe", "token"):
                sec, n = run(form, work)
                print(
                    f"{replicas}x rep{rep} {form}: {sec:.2f}s"
                    f" rows={n}",
                    flush=True,
                )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
