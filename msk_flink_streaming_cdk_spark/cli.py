"""Batch-query CLI — the user-facing front door to the registry.

    python -m msk_flink_streaming_cdk_spark.cli list [substring]
    python -m msk_flink_streaming_cdk_spark.cli run <query> \
        [--sf-dir DIR] [--output PATH] [--format parquet|csv|json] \
        [--limit N] [--explain]

``run`` executes one registered query against the fixture tables in
``--sf-dir`` and either prints the first rows (default) or writes the
full result with the chosen format. ``--explain`` prints the formatted
physical plan instead of executing — the plan-review workflow from
PLANS.md on any query, any data directory.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="msk_flink_streaming_cdk_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("list", help="list registered queries")
    pl.add_argument("substring", nargs="?", default="")

    pr = sub.add_parser("run", help="run one registered query")
    pr.add_argument("query")
    pr.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pr.add_argument("--output", default=None)
    pr.add_argument(
        "--format", default="parquet", choices=["parquet", "csv", "json"]
    )
    pr.add_argument("--limit", type=int, default=20)
    pr.add_argument("--explain", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .registry import ORACLES, QUERIES

    if args.cmd == "list":
        for name in QUERIES:
            if args.substring in name:
                kind = "oracle" if name in ORACLES else "rows-only"
                print(f"{name}\t{kind}")
        return 0

    if args.query not in QUERIES:
        near = [n for n in QUERIES if args.query in n]
        print(
            f"unknown query {args.query!r}"
            + (f"; did you mean one of {near[:5]}?" if near else ""),
            file=sys.stderr,
        )
        return 2

    from .session import get_spark

    spark = get_spark()
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        from .plans import formatted_plan

        print(formatted_plan(df))
        return 0
    if args.output:
        df.write.mode("overwrite").format(args.format).save(args.output)
        print(f"wrote {args.output} ({args.format})")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
