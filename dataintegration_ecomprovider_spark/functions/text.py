"""Scalar string helpers shared across operators.

Case-insensitive comparison is pervasive in the reference (OrdinalIgnoreCase
dictionaries/compares, e.g. src/EcomDestinationWriter.cs:50-52, :84, :1053);
the engine convention is to normalize join/dedup keys with lower().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ci(col: Column) -> Column:
    """Normalize a key for the reference's OrdinalIgnoreCase semantics."""
    return F.lower(col)


def max_id_suffix(df: DataFrame, col: str, prefix: str) -> Column:
    """High-water-mark scan for surrogate-ID allocation (reference A3:
    ``MAX(CAST(SUBSTRING(id, len+1, ...) AS INT))`` over ``LIKE 'prefix%'``
    rows, src/EcomDestinationWriter.cs:488-655 / GetLastId :657-667).

    Returns a one-row aggregate Column usable via ``df.agg(...)``; the digit
    suffix after `prefix` is parsed as int, non-numeric suffixes ignored.
    Scale note: this is a single full-column scan with a map-side max — cheap,
    and in practice pushed to a metadata/statistics read where available.
    """
    c = F.col(col)
    suffix = F.substring(c, len(prefix) + 1, 64)
    return F.max(
        F.when(
            c.startswith(prefix) & suffix.rlike("^[0-9]+$"),
            suffix.cast("long"),
        )
    )
