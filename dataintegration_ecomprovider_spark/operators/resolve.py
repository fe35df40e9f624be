"""Entity-resolution cascades (reference E2/E4/E9/E14, §2.9 case folding).

The reference resolves foreign references by trying keys in priority order
— language by ID → Code2 → Name (GetLanguageID, src/EcomDestinationWriter.cs:
2513-2569), product by ID → Number → Name (GetExistingProduct :3984-4026),
manufacturer by ID then Name (:4146-4165) — with OrdinalIgnoreCase
comparisons, and auto-creates missing dimension rows.

Spark-first shape: one left join per fallback stage against the (broadcast)
dimension, then a coalesce across the stages.  Each stage joins on a
lower()-normalized key (engine convention for the reference's
case-insensitivity).  Auto-create = anti-join the unresolved slice against
the dimension and allocate surrogate ids (surrogate.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.functions.text import ci


def resolve_cascade(
    df: DataFrame,
    stages: Sequence[tuple[str, DataFrame, str, str]],
    out_col: str,
    broadcast_dim: bool = True,
    case_insensitive: bool = True,
) -> DataFrame:
    """Resolve a reference through fallback stages.

    stages: list of (source_col, dim_df, dim_match_col, dim_value_col);
    the first stage whose join hits wins.  `out_col` holds the resolved
    value (null if no stage matched).
    """
    out = df
    stage_cols = []
    for i, (src_col, dim, match_col, value_col) in enumerate(stages):
        tag = f"__res_{i}"
        d = dim.select(
            (ci(F.col(match_col)) if case_insensitive else F.col(match_col)).alias(f"{tag}_k"),
            F.col(value_col).alias(tag),
        ).dropDuplicates([f"{tag}_k"])
        if broadcast_dim:
            d = F.broadcast(d)
        left_key = ci(out[src_col]) if case_insensitive else out[src_col]
        out = out.join(d, left_key == d[f"{tag}_k"], "left").drop(f"{tag}_k")
        stage_cols.append(tag)
    out = out.withColumn(out_col, F.coalesce(*[F.col(c) for c in stage_cols]))
    return out.drop(*stage_cols)
