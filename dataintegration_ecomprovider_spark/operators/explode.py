"""Membership explode — comma-quoted lists to relation rows (reference E5/E6).

The reference splits the `Groups` / `GroupSorting` parallel list columns and
emits one EcomGroupProductRelation row per element (HandleProductGroups,
src/EcomDestinationWriter.cs:1413-1464; AddGroupReferenceToProduct
:2699-2749), and splits dot-composite `VariantOptions` the same way
(:1309-1343).

Spark-first shape: decode to arrays, `posexplode` to keep element position,
and align the parallel sorting array by index (arrays_zip semantics — the
reference indexes the sorting array by the same loop counter, :1431-1446).
Explodes multiply rows; at 100 TB a hot parent (product in thousands of
groups) is a skew source — AQE skew-join handles the following join, and
the explode itself is embarrassingly parallel (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.functions.lists import decode_quoted_list


def explode_membership(
    df: DataFrame,
    parent_keys: list[str],
    list_col: str,
    value_name: str,
    sorting_col: str | None = None,
    sorting_name: str = "sorting",
) -> DataFrame:
    """One output row per list element: parent keys + element + position
    (+ aligned sorting value when a parallel sorting column exists; missing
    positions default to 0 like the reference's int.TryParse fallback,
    src/EcomDestinationWriter.cs:1441-1446)."""
    values = decode_quoted_list(F.col(list_col))
    out = df.select(*parent_keys, F.posexplode(values).alias("pos", value_name),
                    *([decode_quoted_list(F.col(sorting_col)).alias("__sort_arr")] if sorting_col else []))
    if sorting_col:
        sort_val = F.element_at("__sort_arr", F.col("pos") + 1)
        out = out.withColumn(
            sorting_name,
            F.coalesce(sort_val.cast("int"), F.lit(0)),
        ).drop("__sort_arr")
    return out
