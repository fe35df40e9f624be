"""Primary-flag demotion — exactly one primary relation per parent (E5).

The reference, while adding group-product relations, demotes the previous
primary relation when a newly staged one is primary
(AddGroupReferenceRowToProduct, src/EcomDestinationWriter.cs:2916-2973:
the insert scans existing rows for IsPrimary=1 and flips them to 0).

Spark-first shape (SURVEY §7 hard part #4): a single ranking window over
the UNION of staged and existing relations, partitioned by the parent —
staged rows outrank existing ones, and within a tier the explicit order
breaks ties.  Rank 1 among primary-claiming rows keeps its flag; everything
else is demoted.  One shuffle on the parent key; no per-row scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def demote_previous_primary(
    existing: DataFrame,
    staged: DataFrame,
    parent_keys: Sequence[str],
    primary_col: str,
    order_by: Sequence[Column],
) -> DataFrame:
    """Union staged+existing relations, keeping at most ONE primary per
    parent: the best primary-claiming row under (staged-first, order_by).

    Both inputs need identical schemas (parent keys + relation payload +
    boolean `primary_col`).  Output = same columns plus `src` dropped;
    staged rows win entirely on (parent, relation) collisions first
    (relation_swap semantics are the caller's concern — this operator only
    arbitrates the primary flag)."""
    tagged = staged.withColumn("__tier", F.lit(0)).unionByName(
        existing.withColumn("__tier", F.lit(1))
    )
    w = Window.partitionBy(*parent_keys).orderBy(
        # primary claimants first, staged before existing, then the explicit order
        F.when(F.col(primary_col), F.lit(0)).otherwise(F.lit(1)).asc(),
        F.col("__tier").asc(),
        *order_by,
    )
    ranked = tagged.withColumn("__rn", F.row_number().over(w))
    return ranked.withColumn(
        primary_col, F.col(primary_col) & (F.col("__rn") == 1)
    ).drop("__tier", "__rn")
