"""Simulate the scoring driver: plain SparkSession + DuckDB oracles.

Usage: python tools/driver_sim.py [--window N] [names...]

Runs entry() smoke, then each named query (default: every queries()
entry; --window N = the first N in registry order, which is exactly
the driver's correctness window) at sf0.01, comparing to oracle_sql()
via DuckDB with the driver's canonicalization (columns sorted by
name, rows sorted, floats rounded to 6dp, naive-UTC timestamps).
Unlike tests/ (which use the repo session factory), this uses a PLAIN
SparkSession — the environment the real driver provides — so it
catches conf-dependence bugs the test suite can't (see
.claude/skills/verify/SKILL.md).
"""

import math
import os
import sys
from datetime import datetime, timezone
from decimal import Decimal

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()
SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")

# Integer DuckDB declarations pandas floats when the column has NULLs.
# HUGEINT and DECIMAL are deliberately NOT here — the real driver
# surfaces those as float64, and the sim must keep catching them.
_INT_DECLS = {
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
}


def canon_value(v):
    if v is None or v is pd.NA or v is pd.NaT:
        return "\0NULL"
    if isinstance(v, float) and math.isnan(v):
        return "\0NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        # float(v) first: np.float64 subclasses float, and under
        # numpy >= 2.0 repr(np.float64(x)) is 'np.float64(x)', which
        # would hash-mismatch every float column (round-7 advice).
        r = round(float(v), 6)
        return "0.0" if r == 0 else repr(r)
    if isinstance(v, Decimal):
        # Dtype-faithful on purpose: Spark collects DecimalType as
        # Decimal ('276.00') while the driver's DuckDB .df() fetch
        # renders DECIMAL as float64 ('276.0'). Keeping str() here
        # makes the sim catch any decimal-typed OUTPUT column the way
        # the real driver does (round-6 red rows). Queries must cast
        # final money columns to double (lint in
        # tests/test_reference_queries.py::test_no_query_surfaces_decimal).
        return str(v)
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(canon_value(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def main():
    args = sys.argv[1:]
    window = None
    if args and args[0] == "--window":
        window = int(args[1])
        args = args[2:]

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = E.entry(spark)
    n = len(df.collect())
    print(f"entry: OK rows={n}")

    queries = E.queries()
    oracles = E.oracle_sql()
    names = args or list(queries)
    if window:
        names = names[:window]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )

    bad = 0
    for name in names:
        try:
            sdf = queries[name](spark, SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"ROWS_ONLY {name} rows={len(srows)}")
                continue
            # .df(), not fetchall(): the driver compares pandas frames,
            # and DuckDB's pandas conversion turns DECIMAL/HUGEINT into
            # float64 — the dtype asymmetry behind the round-5/6 red
            # rows. fetchall() would hand back Decimal objects and hide
            # it. But pandas ALSO over-coerces two dtypes the driver
            # doesn't float (round-7 advice): DATE -> datetime64 and
            # nullable integer -> float64. Un-coerce ONLY those two,
            # using the relation's declared DuckDB types, so the sim
            # keeps catching DECIMAL/HUGEINT leaks while no longer
            # false-FAILing date/int columns the real driver passes.
            rel = con.sql(oracles[name])
            decl = dict(zip(rel.columns, (str(t) for t in rel.types)))
            odf = rel.df()
            for c in odf.columns:
                dt = str(odf[c].dtype)
                if decl.get(c) == "DATE" and dt.startswith("datetime64"):
                    odf[c] = odf[c].dt.date
                elif decl.get(c) in _INT_DECLS and dt == "float64":
                    odf[c] = odf[c].astype("Int64")
            ocols = list(odf.columns)
            orows = list(odf.itertuples(index=False, name=None))
            sc, sr = canon(scols, srows)
            oc, orr = canon(ocols, orows)
            ok_rows = len(sr) == len(orr)
            ok_schema = sc == oc
            ok_hash = sr == orr
            if ok_rows and ok_schema and ok_hash:
                print(f"PASS {name} rows={len(sr)}")
            else:
                bad += 1
                print(
                    f"FAIL {name} rows={len(sr)}/{len(orr)} "
                    f"schema={ok_schema} hash={ok_hash}"
                )
                if not ok_schema:
                    print("  spark cols:", sc)
                    print("  oracle cols:", oc)
                elif ok_rows:
                    for a, b in zip(sr, orr):
                        if a != b:
                            print("  spark :", a[:6])
                            print("  oracle:", b[:6])
                            break
        except Exception as e:  # noqa: BLE001
            bad += 1
            print(f"ERROR {name}: {str(e)[:300]}")
    print(f"done: {bad} failures")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
