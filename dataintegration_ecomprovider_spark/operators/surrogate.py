"""Surrogate-ID assignment (reference A3 + E1).

The reference allocates `Imported<KIND><n>` ids for rows arriving without
one, continuing from the destination's high-water mark
(``MAX(CAST(SUBSTRING(id,...) AS INT))`` over ``LIKE 'Imported<KIND>%'``,
GetLastId src/EcomDestinationWriter.cs:488-667; allocation sites e.g. PROD
:1590, GROUP :2101, MANU :2213).

Spark-first shape: the high-water mark is one map-side-max aggregate; the
allocation is `row_number()` over a TOTAL order on the rows needing ids,
plus the offset.  Determinism matters (SURVEY §4): `monotonically_increasing_id`
changes across retries/partitionings, `row_number` over an explicit unique
ordering does not.  The single-partition window over only-the-unkeyed-rows is
fine at scale: rows missing ids are a small slice, and the window runs after
a filter, not over the whole table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.functions.text import max_id_suffix


def high_water_mark(existing: DataFrame, id_col: str, prefix: str) -> int:
    """Current max numeric suffix over `prefix`-ids (0 if none)."""
    row = existing.agg(max_id_suffix(existing, id_col, prefix).alias("hw")).collect()[0]
    return int(row["hw"] or 0)


def assign_surrogate_ids(
    df: DataFrame,
    id_col: str,
    prefix: str,
    order_by: Sequence[Column],
    offset: int,
    needs_id: Column | None = None,
) -> DataFrame:
    """Fill missing ids with `prefix{offset + rank}` under a total order.

    `needs_id` defaults to "id null or empty" (the reference treats both as
    missing, src/EcomDestinationWriter.cs:1585-1590).
    """
    if needs_id is None:
        needs_id = F.col(id_col).isNull() | (F.length(F.trim(F.col(id_col))) == 0)
    need = df.filter(needs_id)
    keep = df.filter(~needs_id)
    w = Window.orderBy(*order_by)
    allocated = need.withColumn(
        id_col,
        F.concat(F.lit(prefix), (F.lit(offset) + F.row_number().over(w)).cast("string")),
    )
    return keep.unionByName(allocated)
