"""Per-query cost decomposition probe (optimization round 15).

For each named query, measures on a warm session:
- build_s:   Python DataFrame construction (plan building + analysis)
- plan_s:    .explain cost = Catalyst optimization + physical planning
             (measured via df._sc / queryExecution trigger)
- exec1_s:   first noop write (codegen + execution)
- exec2_s:   second noop write (warm execution — the bench's min)
- jobs:      Spark job count consumed by ONE noop write (probe via
             statusTracker job IDs), which counts count()/collect()
             probe jobs hidden inside the builder as separate jobs.

Usage: python tools/profile_decompose.py name1 name2 ...
       (default: the 25 slowest from BENCH_FULL.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msk_flink_streaming_cdk_spark.registry import QUERIES
from msk_flink_streaming_cdk_spark.registry.llm_q import bench_warm
from msk_flink_streaming_cdk_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        full = json.load(open(os.path.join(os.path.dirname(__file__), "..", "BENCH_FULL.json")))
        names = [n for n, _ in sorted(full["queries"].items(), key=lambda kv: -kv[1])[:25]]
    spark = get_spark(app_name="profile-decompose")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    # same warmup as bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    QUERIES["q1_alerts_daily"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    import gc

    def next_job_id(sc):
        v = sc._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else v.get()

    print(f"{'query':44s} {'build':>6s} {'plan':>6s} {'exec1':>6s} {'exec2':>6s} {'jobs':>5s}")
    for name in names:
        if name not in QUERIES:
            print(f"{name}: NOT REGISTERED")
            continue
        bench_warm(name, spark, SF_DIR)
        sc = spark.sparkContext
        j0 = next_job_id(sc)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        t1 = time.perf_counter()
        # force optimization + physical planning without execution
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        j1 = next_job_id(sc)
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        j2 = next_job_id(sc)
        df2 = QUERIES[name](spark, SF_DIR)
        df2.write.format("noop").mode("overwrite").save()
        t4 = time.perf_counter()
        print(
            f"{name:44s} {t1 - t0:6.2f} {t2 - t1:6.2f} {t3 - t2:6.2f} "
            f"{t4 - t3:6.2f} {j2 - j1:5d}  (builder jobs: {j1 - j0})"
        )
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
    spark.stop()


if __name__ == "__main__":
    main()
