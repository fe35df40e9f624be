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

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


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
