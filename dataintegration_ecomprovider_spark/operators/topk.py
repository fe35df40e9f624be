"""TOP(1)-per-group and top-k operators (reference A8).

The reference computes ``SELECT TOP(1) GroupID ... WHERE ...=outer.key AND
IsPrimary=1`` correlated per product row (PrimaryGroup,
src/EcomSourceReader.cs:401-404) and a default-shop pick
``top(1) ... ORDER BY ShopDefault DESC`` (src/EcomDestinationWriter.cs:2986).

Spark-first shape: a ranking window partitioned by the group key — one
shuffle, no correlated execution.  The ordering MUST be total (tie-broken on
a unique key) so results are deterministic across retries and cluster sizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the first k rows of each group under a total order."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w))
    out = ranked.filter(F.col("__rn") <= k)
    if rank_col:
        out = out.withColumnRenamed("__rn", rank_col)
    else:
        out = out.drop("__rn")
    return out
