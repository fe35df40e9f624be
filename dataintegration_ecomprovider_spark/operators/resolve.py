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


class MissingReferencesError(Exception):
    """The reference's FailOnMissingGroups contract: rows referencing
    missing dimension values abort the job, and the failing rows are
    dumped to the log (EcomProductsMissingGroupsErrorMessage +
    'Failed row: [col: "value"], ...' — src/EcomDestinationWriter.cs:
    4566-4572 + LogFailedRows :4574-4590, triggered when EcomProducts is
    imported with CreateMissingGoups off, src/EcomProvider.cs:1002-1005;
    the job-failure handler replays the dump, :1060-1064)."""

    def __init__(self, message: str, rows: list[dict]):
        super().__init__(message)
        self.rows = rows


def fail_on_missing(
    staged: DataFrame,
    dim: DataFrame,
    src_col: str,
    match_col: str,
    dump_cols: Sequence[str] | None = None,
    dump_limit: int = 10,
    case_insensitive: bool = True,
) -> DataFrame:
    """E5 failure mode: error (instead of auto-create or drop) when staged
    rows reference dimension values that don't exist.

    One anti-join against the (broadcast-eligible) dimension finds the
    offenders; at most `dump_limit` of them are collected for the error
    payload — a bounded action, so the validation gate stays cheap at any
    scale (the anti-join is the same shuffle/broadcast shape the resolve
    join needs anyway).  Returns `staged` unchanged when everything
    resolves, mirroring the reference's pass-through."""
    key = ci(F.col(match_col)) if case_insensitive else F.col(match_col)
    dim_keys = dim.select(key.alias("__dim_k")).dropDuplicates(["__dim_k"])
    staged_key = ci(F.col(src_col)) if case_insensitive else F.col(src_col)
    missing = (
        staged.filter(F.col(src_col).isNotNull())
        .withColumn("__k", staged_key)
        .join(F.broadcast(dim_keys), F.col("__k") == F.col("__dim_k"), "left_anti")
        .drop("__k")
    )
    dump = missing.select(*(dump_cols or staged.columns)).limit(dump_limit + 1).collect()
    if dump:
        rows = [r.asDict() for r in dump[:dump_limit]]
        dumped = "\n".join(
            "Failed row: " + ", ".join(f'[{k}: "{v}"]' for k, v in r.items())
            for r in rows
        )
        more = " (more rows omitted)" if len(dump) > dump_limit else ""
        raise MissingReferencesError(
            f"import failed: {src_col} references missing values in "
            f"{match_col}{more}:\n{dumped}",
            rows,
        )
    return staged


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
