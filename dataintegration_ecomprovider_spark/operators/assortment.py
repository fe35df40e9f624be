"""Assortment rebuild (E18) — recompute membership, flip activation.

The reference tracks assortments touched during an import, then rebuilds
each: a temp table of affected ProductAutoIDs is assembled from the
assortment's product/group/shop relation sets (IN-list chunks of 3000,
src/AssortmentHandler.cs:224-241), products are deactivated, membership is
recomputed by the service, and products reactivate
(RebuildAssortments, src/AssortmentHandler.cs:116-161; activation flip
:272-277).

Spark-first shape: membership is a DISTINCT UNION of relation-derived
(assortment, product) sets — each source is a join chain, the union is one
shuffle on the pair, and the IN-list chunking disappears (semi-joins carry
arbitrary cardinality).  Rebuild-from-relations replaces the reference's
incremental fixups entirely: recomputing the set is one pass and cannot
drift from the relation tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rebuild_membership(
    sources: Sequence[DataFrame],
    assortment_col: str = "assortment_id",
    product_col: str = "product_id",
    active_products: DataFrame | None = None,
) -> DataFrame:
    """Distinct union of (assortment, product) pairs from every relation
    source, optionally restricted to active products (the reference only
    enrolls ProductActive rows, src/AssortmentHandler.cs:194)."""
    out = None
    for src in sources:
        pairs = src.select(assortment_col, product_col)
        out = pairs if out is None else out.unionByName(pairs)
    out = out.dropDuplicates([assortment_col, product_col])
    if active_products is not None:
        out = out.join(active_products.select(product_col), product_col, "left_semi")
    return out


def activate_for_membership(
    products: DataFrame,
    membership: DataFrame,
    product_col: str = "product_id",
    flag_col: str = "product_active",
) -> DataFrame:
    """The deactivate → rebuild → reactivate flag flip as one transform:
    products enrolled in ≥1 assortment end active, everything else ends
    inactive (the reference's UPDATE pair, src/AssortmentHandler.cs:272-277)."""
    enrolled = membership.select(product_col).dropDuplicates([product_col]).withColumn(
        "__on", F.lit(True)
    )
    return (
        products.join(enrolled, product_col, "left")
        .withColumn(flag_col, F.coalesce(F.col("__on"), F.lit(False)))
        .drop("__on")
    )
