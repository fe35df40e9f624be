"""Variant row expansion (reference E12) — 1:N row multiplication.

Products imported without a ProductVariantID are cloned once per existing
(variantId, variantCounter) of the matching product so every variant row
gets the update (UpdateFieldsInExistingProductsWithVariantIDs,
src/EcomDestinationWriter.cs:3727-3823; combination enumeration :3825-3867).

Spark-first shape: an inner join staged-rows × existing-variants on the
match key — the multiplication IS the join fan-out.  At scale the variants
side is grouped per product (bounded fan-out) and the join shuffles on the
product key once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def expand_rows(
    staged: DataFrame,
    variants: DataFrame,
    on: Sequence[str],
    carry_cols: Sequence[str],
) -> DataFrame:
    """staged ⋈ variants(on) carrying `carry_cols` from the variants side —
    one output row per (staged row, matching variant)."""
    v = variants.select(*on, *carry_cols).dropDuplicates([*on, *carry_cols])
    return staged.join(v, list(on), "inner")
