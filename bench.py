"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink (measures the
whole plan, excludes result transfer). The set covers every engine
surface: reference windows, scan-heavy agg, multi-join, OVER window,
sliding/session windows, JSON, dedup (exact + MinHash-LSH), similarity
(brute force + LSH-ANN), text analysis, multimodal Arrow path.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from msk_flink_streaming_cdk_spark.registry import QUERIES
from msk_flink_streaming_cdk_spark.session import get_spark

HEADLINE = [
    "q1_alerts_daily",
    "q2_windowed_avg_hourly",
    "agg_pricing_summary",
    "join_orders_per_segment",
    "q3_shipping_priority",
    "window_top3_orders_per_customer",
    "sliding_window_event_counts",
    "session_window_user_sessions",
    "json_extract_props",
    "dedup_exact_text",
    "dedup_minhash_lsh_pairs",
    "similarity_cosine_topk",
    "similarity_lsh_ann_topk",
    "text_quality_scores",
    "multimodal_feature_extract",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen/parquet-reader warmup outside the timings (the first
    # parquet scan otherwise pays one-time class-loading inside the
    # first measured query).
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    QUERIES["q1_alerts_daily"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
