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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.functions.text import ci


def _k(df: DataFrame, name: str, case_insensitive: bool) -> Column:
    """One side of a key comparison.  Under `case_insensitive` string keys
    compare through ci() — the reference matches keys under SQL Server's
    case-insensitive collation everywhere (OrdinalIgnoreCase,
    src/EcomDestinationWriter.cs:50-52, :1053; SURVEY §2.9).  Non-string
    keys are left alone (collation doesn't apply).

    Engine convention: a MATERIALIZED `__k_<name>` column, when present,
    IS the normalized key and is returned as-is.  This is what makes
    bucketed staging exchange-free: operators/bucketing.py writes staging
    and destination tables bucketed on the materialized norm columns, and
    because every merge-family comparison resolves to that same column
    attribute, Catalyst sees the bucketed scan's hash partitioning satisfy
    the join/window distribution — no Exchange.  Recomputing ci() inline
    here would break the attribute lineage and reintroduce the shuffle."""
    col = df[name]
    if case_insensitive and dict(df.dtypes).get(name) == "string":
        nk = f"__k_{name}"
        if nk in df.columns:
            return df[nk]
        return ci(col)
    return col


def _with_norm_keys(
    df: DataFrame, keys: Sequence[str], case_insensitive: bool
) -> tuple[DataFrame, list[str]]:
    """Add `__k_<key>` normalized-key columns for name-based joins (semi /
    anti), returning (df, norm_names).  Callers join on the norm names and
    drop them after.  Pre-materialized norm columns are kept as-is (see
    _k: replacing them would sever the bucketed-scan attribute lineage)."""
    norm = []
    for k in keys:
        nk = f"__k_{k}"
        if nk not in df.columns:
            df = df.withColumn(nk, _k(df, k, case_insensitive))
        norm.append(nk)
    return df, norm


def _key_side(
    df: DataFrame, keys: Sequence[str], case_insensitive: bool
) -> DataFrame:
    """Project just the (normalized) key columns for the build side of a
    semi/anti join."""
    return df.select(
        [
            (df[f"__k_{k}"] if f"__k_{k}" in df.columns
             else _k(df, k, case_insensitive)).alias(f"__k_{k}")
            for k in keys
        ]
    )


def assert_unique_keys(
    staging: DataFrame,
    keys: Sequence[str],
    table: str = "staging",
    case_insensitive: bool = False,
) -> DataFrame:
    """Runtime guard reproducing the reference's duplicate-staging-key
    failure contract: a duplicate key aborts the job with the offending key
    values in the message ("Subquery returned more than 1 value" → check
    for duplicate ProductNumber rows, src/EcomProvider.cs:1052-1053).

    Implemented as a count-over-keys window + a conditional raise_error in a
    filter — the check rides along the job's own execution (no separate
    validation pass over staging; the window shuffles on the same keys the
    merge join needs anyway)."""
    w = Window.partitionBy(*[_k(staging, k, case_insensitive) for k in keys])
    msg = F.concat(
        F.lit(f"duplicate staging key in {table} ("),
        F.concat_ws(
            ", ", *[F.col(k).cast("string") for k in keys]
        ),
        F.lit(
            ") — remove rows with duplicate key values from the source "
            "(reference: 'Subquery returned more than 1 value', "
            "src/EcomProvider.cs:1052-1053)"
        ),
    )
    return (
        staging.withColumn("__kcnt", F.count(F.lit(1)).over(w))
        .filter(
            F.when(F.col("__kcnt") > 1, F.raise_error(msg)).otherwise(F.lit(True))
        )
        .drop("__kcnt")
    )


def upsert(
    dest: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    insert_new: bool = True,
    update_existing: bool = True,
    update_columns: Sequence[str] | None = None,
    set_on_update: dict[str, Column] | None = None,
    set_on_insert: dict[str, Column] | None = None,
    validate_unique: bool = False,
    case_insensitive: bool = False,
    evolve_schema: bool = False,
) -> DataFrame:
    """New table state after the U1-U3 upsert matrix.

    - matched rows take staging's values for `update_columns` (default: all
      non-key columns present in both) when `update_existing` (U1);
    - unmatched staging rows are appended when `insert_new` (U2);
    - `set_on_update` / `set_on_insert` add audit stamps (the reference
      stamps ProductUpdated / ProductCreated, src/EcomDestinationWriter.cs:
      3274, 3286-3289);
    - `validate_unique` enforces the reference's duplicate-staging-key
      failure contract (assert_unique_keys);
    - `case_insensitive` matches string keys under ci() — the reference's
      SQL Server collation semantics; matched rows keep the DEST key casing
      (an UPDATE never rewrites the PK);
    - `evolve_schema=True` ADDS staging-only columns to the output (Delta
      mergeSchema semantics — the reference's schema-augmentation analog
      on the write path, src/EcomProvider.cs:346-381): touched rows take
      the staged value, untouched dest rows get null.  Default False keeps
      the strict contract: staging-only columns are dropped.

    Implementation: ONE full-outer join = one staging read and one dest
    read producing both halves (matched rewrites + unmatched inserts) in a
    single pass — at 100 TB this halves staging scans vs the reference's
    two statements (UPDATE + INSERT-via-anti-join, MoveDataToMainTable
    src/EcomDestinationWriter.cs:3220-3333).  `upsert_two_pass` keeps the
    literal two-statement form as a cross-check oracle.  Both sides shuffle
    once on the keys (or the small side broadcasts).
    """
    dest_cols = dest.columns
    dtypes = dict(dest.dtypes)
    if update_columns is None:
        update_columns = [c for c in dest_cols if c not in keys and c in staging.columns]
    if validate_unique:
        staging = assert_unique_keys(
            staging, keys, case_insensitive=case_insensitive
        )

    s = staging.select(
        [F.col(c).alias(f"__s_{c}") for c in staging.columns]
    ).withColumn("__s_present", F.lit(True))
    d = dest.withColumn("__d_present", F.lit(True))
    cond = F.lit(True)
    for k in keys:
        nk = f"__k_{k}"
        if nk in dest.columns and nk in staging.columns:
            # materialized norm keys (bucketed staging): compare the
            # bucketed column attributes directly so the bucketed scans'
            # partitioning satisfies the join — no Exchange (see _k)
            cond = cond & (d[nk] == s[f"__s_{nk}"])
        else:
            cond = cond & (
                _k(d, k, case_insensitive) == _k(s, f"__s_{k}", case_insensitive)
            )

    joined = d.join(s, cond, "full_outer" if insert_new else "left")
    matched = d["__d_present"].isNotNull() & s["__s_present"].isNotNull()
    insert_row = d["__d_present"].isNull()

    out_cols = []
    for c in dest_cols:
        if update_existing and c in update_columns:
            expr = F.when(matched, s[f"__s_{c}"]).otherwise(d[c])
        else:
            expr = d[c]
        if update_existing and set_on_update and c in set_on_update:
            expr = F.when(matched, set_on_update[c]).otherwise(expr)
        if insert_new:
            if set_on_insert and c in set_on_insert:
                ins = set_on_insert[c]
            elif c in staging.columns:
                ins = s[f"__s_{c}"]
            else:
                ins = F.lit(None).cast(dtypes[c])
            expr = F.when(insert_row, ins).otherwise(expr)
        out_cols.append(expr.alias(c))
    if evolve_schema:
        # a new column populates only the rows this merge actually touches
        # under the mode matrix: updated rows (when updating) and inserted
        # rows (when inserting); everything else is null
        touched = F.lit(False)
        if update_existing:
            touched = touched | matched
        if insert_new:
            touched = touched | insert_row
        for c in staging.columns:
            if c in dest_cols or c.startswith("__"):
                continue
            out_cols.append(
                F.when(touched, s[f"__s_{c}"]).otherwise(F.lit(None)).alias(c)
            )
    return joined.select(*out_cols)


def upsert_two_pass(
    dest: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    insert_new: bool = True,
    update_existing: bool = True,
    update_columns: Sequence[str] | None = None,
    set_on_update: dict[str, Column] | None = None,
    set_on_insert: dict[str, Column] | None = None,
) -> DataFrame:
    """The reference's literal two-statement form (UPDATE join + INSERT
    anti-join) — kept as a cross-check for the single-pass `upsert`
    (tests assert both produce identical rows).  Reads staging twice."""
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


def delete_incoming(
    dest: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    case_insensitive: bool = False,
) -> DataFrame:
    """U4 DeleteIncomingItems: remove dest rows matched by staging (semi-
    delete → remaining = anti join; src/EcomDestinationWriter.cs:3116-3132)."""
    d, norm = _with_norm_keys(dest, keys, case_insensitive)
    return d.join(
        _key_side(staging, keys, case_insensitive), norm, "left_anti"
    ).drop(*norm)


def remove_missing(
    dest: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    scope: Column | None = None,
    case_insensitive: bool = False,
) -> DataFrame:
    """U5/U6/U8 delete-missing: remove dest rows NOT in staging, optionally
    only within `scope` (the reference's shop/language extra conditions,
    src/EcomDestinationWriter.cs:3067-3114, :3134-3163).  Rows outside the
    scope are kept regardless.

    remaining = (dest ∈ scope ∧ dest semi staging) ∪ (dest ∉ scope)
    """
    skeys = _key_side(staging, keys, case_insensitive)
    if scope is None:
        d, norm = _with_norm_keys(dest, keys, case_insensitive)
        return d.join(skeys, norm, "left_semi").drop(*norm)
    in_scope, norm = _with_norm_keys(dest.filter(scope), keys, case_insensitive)
    out_scope = dest.filter(~scope | scope.isNull())
    kept = in_scope.join(skeys, norm, "left_semi").drop(*norm)
    return kept.unionByName(out_scope)


def deactivate_missing(
    dest: DataFrame,
    staging: DataFrame,
    keys: Sequence[str],
    flags: dict[str, Column],
    scope: Column | None = None,
    case_insensitive: bool = False,
) -> DataFrame:
    """U7 soft delete: instead of removing missing rows, set flag columns
    (ProductActive=false, optionally ProductHidden=true;
    src/EcomProvider.cs:164-168, src/EcomDestinationWriter.cs:3093-3101)."""
    norm = [f"__k_{k}" for k in keys]
    marker = (
        _key_side(staging, keys, case_insensitive)
        .dropDuplicates(norm)
        .withColumn("__hit", F.lit(True))
    )
    d, _ = _with_norm_keys(dest, keys, case_insensitive)
    joined = d.join(marker, norm, "left")
    missing = F.col("__hit").isNull()
    if scope is not None:
        missing = missing & scope
    out = joined
    for name, value in flags.items():
        out = out.withColumn(name, F.when(missing, value).otherwise(F.col(name)))
    return out.drop("__hit", *norm)


def relation_swap(
    dest: DataFrame,
    staging: DataFrame,
    match_keys: Sequence[str],
    case_insensitive: bool = False,
) -> DataFrame:
    """U9 relation-table swap: delete dest rows matching staged rows on
    `match_keys` (pair-key or parent-key per flags,
    src/EcomDestinationWriter.cs:4218-4277) then insert staged rows.

    new = (dest anti staging[match_keys]) ∪ staging
    """
    d, norm = _with_norm_keys(dest, match_keys, case_insensitive)
    survivors = d.join(
        _key_side(staging, match_keys, case_insensitive).dropDuplicates(norm),
        norm, "left_anti",
    ).drop(*norm)
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
