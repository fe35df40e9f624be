"""Bucketed storage — co-located joins without shuffles (SURVEY §7 phase 4).

The reference's repeated merge joins all hit SQL Server indexes; the Spark
analog for repeated large-table joins on a stable key is BUCKETED tables:
`bucketBy(n, key)` pre-shuffles data at write time, so every later join or
aggregation on that key reads co-located buckets and skips its Exchange
entirely.  For the import pipeline this fits the staging tables (S5/S6):
stage bucketed by the merge key once, then the upsert join, delete-missing
anti-join and relation swaps all run shuffle-free against the equally
bucketed destination.

tests/test_bucketing.py proves the plan shape: the bucketed-to-bucketed
join has NO Exchange on either side.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.functions.text import ci


def norm_bucket_columns(
    df: DataFrame, keys: Sequence[str], case_insensitive: bool
) -> tuple[DataFrame, list[str]]:
    """Materialize the bucket-key columns for a merge on `keys`.

    String keys under case-insensitive matching bucket on a materialized
    `__k_<key>` = ci(key) column (the merge family compares through ci();
    bucketing on the raw casing would co-locate nothing).  Non-string keys
    bucket on the raw column — collation doesn't apply and the merge
    compares the attribute directly.  The returned names are what both
    sides must be bucketed on, and operators/merge.py resolves every key
    comparison to these same attributes (see merge._k), which is what
    erases the Exchange."""
    out = df
    cols: list[str] = []
    dtypes = dict(df.dtypes)
    for k in keys:
        if case_insensitive and dtypes.get(k) == "string":
            nk = f"__k_{k}"
            if nk not in out.columns:
                out = out.withColumn(nk, ci(F.col(k)))
            cols.append(nk)
        else:
            cols.append(k)
    return out, cols


def stage_for_merge(
    spark: SparkSession,
    df: DataFrame,
    keys: Sequence[str],
    table_name: str,
    num_buckets: int = 32,
    case_insensitive: bool = True,
) -> DataFrame:
    """Write one merge side as a bucketed table on its (normalized) merge
    keys and read it back with bucket metadata — the Spark analog of the
    reference's typed temp tables keyed like their destination
    (CreateTempTables, src/EcomDestinationWriter.cs:234-417).

    Staging pays its shuffle once here (the repartition makes one file per
    bucket, which also preserves sortedness for merge-join reads); every
    downstream join / window / dedup on the keys then reads co-located
    buckets with NO Exchange."""
    if not spark.catalog.tableExists(table_name):
        # a previous session's staging table may have left its managed
        # location behind without a catalog entry (the in-memory catalog
        # dies with the session); overwrite can only reclaim registered
        # locations, so clear the orphan
        import shutil
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
        stale = os.path.join(wh.path or str(wh), table_name.lower())
        shutil.rmtree(stale, ignore_errors=True)
    df, bucket_cols = norm_bucket_columns(df, keys, case_insensitive)
    df = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    write_bucketed(df, table_name, bucket_cols, num_buckets,
                   sort_keys=bucket_cols)
    return bucketed(spark, table_name)


def drop_staging_tables(spark: SparkSession, prefix: str) -> int:
    """Drop all staging tables created under `prefix` (the reference drops
    its temp tables on Close, src/EcomDestinationWriter.cs:4167-4182).
    Call AFTER the job's outputs are consumed or published — the returned
    state DataFrames read these tables lazily."""
    n = 0
    for tbl in spark.catalog.listTables():
        if tbl.name.startswith(prefix.lower()):
            spark.sql(f"DROP TABLE IF EXISTS {tbl.name}")
            n += 1
    return n


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_keys: Sequence[str],
    num_buckets: int = 32,
    sort_keys: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and optionally sorted) managed table.
    `num_buckets` should match the cluster's target parallelism for the
    table's joins; sort keys make merge joins read-ordered runs."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact (a plain
    parquet path read would lose it)."""
    return spark.table(table_name)
