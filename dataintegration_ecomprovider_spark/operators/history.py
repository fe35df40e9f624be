"""SCD Type-2 history builder: turn an append-only changelog into
validity-interval dimension rows (valid_from / valid_to / is_current).

The reference's destination writer overwrites dimension rows in place
(upsert, operators/merge.py); warehouse users of the same pipeline
routinely need the *history-preserving* variant, so this is the
first-class companion: consecutive no-op changes collapse (a change row
whose tracked attributes equal the previous state opens no new version),
and each surviving version's ``valid_to`` is the next version's
``valid_from`` (null = current).

Shape: two partitioned windows over one shuffle on the business key —
``lag`` to detect attribute changes, ``lead`` to close intervals.  No
global window, no driver state; streams per key at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    changes: DataFrame,
    *,
    keys: Sequence[str],
    ts_col: str = "ts",
    attr_cols: Sequence[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a changelog into SCD2 versions.

    Output: keys + attr_cols + ``valid_from`` (ts of the change that
    opened the version), ``valid_to`` (ts of the next version, null for
    the open one), ``is_current``.  Rows whose attributes equal the
    immediately preceding state are dropped before interval assignment,
    so touching a row without changing it never splits a version.

    ``tiebreak_col`` orders same-timestamp changes deterministically
    (required whenever ts alone isn't unique per key).
    """
    keys, attr_cols = list(keys), list(attr_cols)
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attr_cols])
    versions = (
        changes.withColumn("_scd_prev", F.lag(state).over(w))
        .filter(
            F.col("_scd_prev").isNull()
            | ~state.eqNullSafe(F.col("_scd_prev"))
        )
        .drop("_scd_prev")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return versions.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )
