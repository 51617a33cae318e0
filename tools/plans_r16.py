"""Snapshot .explain("formatted") for named queries into plans/r16/.

Usage: python tools/plans_r16.py before|after name1 name2 ...

Writes plans/r16/<name>_<tag>.txt at sf0.1 (the bench SF — the
optimization round's evidence files; PLANS.md stays the sf0.001
showcase). Queries whose plans are checkpoint-truncated still show
the final stage, same as PLANS.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), "first arg must be before|after"
    os.makedirs(OUT_DIR, exist_ok=True)

    from msk_flink_streaming_cdk_spark.plans.checks import formatted_plan
    from msk_flink_streaming_cdk_spark.registry import QUERIES
    from msk_flink_streaming_cdk_spark.registry.llm_q import bench_warm
    from msk_flink_streaming_cdk_spark.session import get_spark

    spark = get_spark(app_name="plans-r16")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered")
            continue
        bench_warm(name, spark, SF_DIR)
        df = QUERIES[name](spark, SF_DIR)
        text = formatted_plan(df)
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
