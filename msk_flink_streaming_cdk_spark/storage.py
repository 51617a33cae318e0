"""Storage-layout helpers for shuffle avoidance at scale.

Bucketing pre-shuffles a table ONCE at write time; any later equi-join
or aggregation on the bucket key reads co-located buckets and skips
the exchange entirely — the biggest single lever for repeated joins
over 100 TB fact tables. (Spark bucketing requires a saveAsTable
catalog entry; plain parquet paths don't retain bucket metadata.)
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally enables exchange-AND-sort-free
    sort-merge joins."""
    spark = df.sparkSession
    # A fresh session's in-memory catalog forgets managed tables but
    # their warehouse directories survive; saveAsTable then fails with
    # LOCATION_ALREADY_EXISTS. Drop both the entry and any orphaned
    # location before writing.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    if warehouse:
        shutil.rmtree(
            os.path.join(warehouse, table.lower()), ignore_errors=True
        )
    writer = (
        df.write.mode("overwrite").format(fmt).bucketBy(
            num_buckets, *bucket_cols
        )
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
