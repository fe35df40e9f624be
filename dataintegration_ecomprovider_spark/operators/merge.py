"""Set-based merge algebra — the reference's write pipeline (SURVEY §2.6).

The reference stages rows into temp tables, then runs one UPDATE (matched)
+ one INSERT-via-anti-join (unmatched) per table inside a transaction
(MoveDataToMainTable, reference src/EcomDestinationWriter.cs:3220-3333),
followed by delete-missing / deactivate-missing / language-scoped deletes
(DeleteExcessFromMainTable :3067-3163) and relation-table swaps/cleanup
(:4191-4323).

Spark-first shape: every statement becomes a join-rewrite producing the new
table state as a DataFrame — callers publish it atomically (plans/publish).
All joins are key-equi-joins; at 100 TB both sides shuffle on the key
columns once (or broadcast when the staging side is small), and the upsert
is a single full-outer join — never a per-row lookup.

Key semantics preserved from the reference:
- matching is on the mapping's key columns (J10);
- InsertOnlyNewRecords / UpdateOnlyExistingRecords mode matrix (U3,
  src/EcomProvider.cs:152-162, src/EcomDestinationWriter.cs:3192-3195);
- deactivate instead of delete (U7, :3093-3101);
- scoped deletes restricted by an extra predicate (U8, :3134-3163).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _key_cond(dest: DataFrame, staging: DataFrame, keys: Sequence[str]) -> Column:
    cond = F.lit(True)
    for k in keys:
        cond = cond & (dest[k] == staging[k])
    return cond


def upsert(
    dest: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    insert_new: bool = True,
    update_existing: bool = True,
    update_columns: Sequence[str] | None = None,
    set_on_update: dict[str, Column] | None = None,
    set_on_insert: dict[str, Column] | None = None,
) -> DataFrame:
    """New table state after the U1-U3 upsert matrix.

    - matched rows take staging's values for `update_columns` (default: all
      non-key columns present in both) when `update_existing` (U1);
    - unmatched staging rows are appended when `insert_new` (U2);
    - `set_on_update` / `set_on_insert` add audit stamps (the reference
      stamps ProductUpdated / ProductCreated, src/EcomDestinationWriter.cs:
      3274, 3286-3289).

    Implementation: one full-outer-shaped pass = dest left join staging
    (rewrite matched) + staging anti dest (inserts).  Duplicate staging keys
    must be resolved upstream (see dedup.py) — the reference errors on them
    ("Subquery returned more than 1 value", src/EcomProvider.cs:1052-1053).
    """
    dest_cols = dest.columns
    if update_columns is None:
        update_columns = [c for c in dest_cols if c not in keys and c in staging.columns]

    s = staging.select([F.col(c).alias(f"__s_{c}") for c in staging.columns])
    cond = F.lit(True)
    for k in keys:
        cond = cond & (dest[k] == s[f"__s_{k}"])

    joined = dest.join(s, cond, "left")
    matched = s[f"__s_{keys[0]}"].isNotNull()
    out_cols = []
    for c in dest_cols:
        if update_existing and c in update_columns:
            expr = F.when(matched, s[f"__s_{c}"]).otherwise(dest[c])
        else:
            expr = dest[c]
        if update_existing and set_on_update and c in set_on_update:
            expr = F.when(matched, set_on_update[c]).otherwise(expr)
        out_cols.append(expr.alias(c))
    updated = joined.select(*out_cols)

    if not insert_new:
        return updated

    inserts = staging.join(dest.select(*keys), list(keys), "left_anti")
    ins_cols = []
    for c in dest_cols:
        if set_on_insert and c in set_on_insert:
            ins_cols.append(set_on_insert[c].alias(c))
        elif c in staging.columns:
            ins_cols.append(F.col(c).alias(c))
        else:
            ins_cols.append(F.lit(None).cast(dict(dest.dtypes)[c]).alias(c))
    inserts = inserts.select(*ins_cols)
    return updated.unionByName(inserts)


def delete_incoming(dest: DataFrame, staging: DataFrame, keys: Sequence[str]) -> DataFrame:
    """U4 DeleteIncomingItems: remove dest rows matched by staging (semi-
    delete → remaining = anti join; src/EcomDestinationWriter.cs:3116-3132)."""
    return dest.join(staging.select(*keys), list(keys), "left_anti")


def remove_missing(
    dest: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    scope: Column | None = None,
) -> DataFrame:
    """U5/U6/U8 delete-missing: remove dest rows NOT in staging, optionally
    only within `scope` (the reference's shop/language extra conditions,
    src/EcomDestinationWriter.cs:3067-3114, :3134-3163).  Rows outside the
    scope are kept regardless.

    remaining = (dest ∈ scope ∧ dest semi staging) ∪ (dest ∉ scope)
    """
    if scope is None:
        return dest.join(staging.select(*keys), list(keys), "left_semi")
    in_scope = dest.filter(scope)
    out_scope = dest.filter(~scope | scope.isNull())
    kept = in_scope.join(staging.select(*keys), list(keys), "left_semi")
    return kept.unionByName(out_scope)


def deactivate_missing(
    dest: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    flags: dict[str, Column],
    scope: Column | None = None,
) -> DataFrame:
    """U7 soft delete: instead of removing missing rows, set flag columns
    (ProductActive=false, optionally ProductHidden=true;
    src/EcomProvider.cs:164-168, src/EcomDestinationWriter.cs:3093-3101)."""
    marker = staging.select(*keys).dropDuplicates(list(keys)).withColumn("__hit", F.lit(True))
    joined = dest.join(marker, list(keys), "left")
    missing = F.col("__hit").isNull()
    if scope is not None:
        missing = missing & scope
    out = joined
    for name, value in flags.items():
        out = out.withColumn(name, F.when(missing, value).otherwise(F.col(name)))
    return out.drop("__hit")


def relation_swap(
    dest: DataFrame,
    staging: DataFrame,
    match_keys: Sequence[str],
) -> DataFrame:
    """U9 relation-table swap: delete dest rows matching staged rows on
    `match_keys` (pair-key or parent-key per flags,
    src/EcomDestinationWriter.cs:4218-4277) then insert staged rows.

    new = (dest anti staging[match_keys]) ∪ staging
    """
    survivors = dest.join(staging.select(*match_keys).dropDuplicates(list(match_keys)),
                          list(match_keys), "left_anti")
    return survivors.unionByName(staging.select(*dest.columns))


def integrity_cleanup(
    relation: DataFrame,
    parents: Sequence[tuple[DataFrame, Sequence[str], Sequence[str]]],
) -> DataFrame:
    """U11/J14 referential-integrity cleanup: keep only relation rows whose
    parents exist — a chain of semi-joins (the reference's NOT EXISTS
    deletes, CleanRelationsTables src/EcomDestinationWriter.cs:4191-4211).

    parents: list of (parent_df, relation_cols, parent_cols) pairs.
    """
    out = relation
    for parent, rel_cols, par_cols in parents:
        p = parent.select([F.col(pc).alias(rc) for rc, pc in zip(rel_cols, par_cols)]).dropDuplicates(list(rel_cols))
        out = out.join(p, list(rel_cols), "left_semi")
    return out
