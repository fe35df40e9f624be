"""Incremental view maintenance (IVM): keep an aggregate table current
in O(changed rows) by consuming the versioned store's CDC feed, instead
of recomputing the aggregate from the full source per refresh.

The maintained view is ``GROUP BY <group_cols>`` with ``COUNT(*)`` and
``SUM(coalesce(col, 0))`` measures — the self-maintainable aggregate
family (counts and sums admit exact retraction; MIN/MAX do not, they
need a recompute on delete, which is why continuous-aggregate systems
draw the same line).  Each refresh:

1. reads ``read_changes(include_old=True)`` for the source's unconsumed
   version range;
2. turns every change row into ±contribution rows — an insert adds its
   values under its group, a delete subtracts under its OLD group, an
   update does both (so a row MOVING between groups adjusts both sides);
3. aggregates the contributions (one shuffle on the group columns —
   O(delta), never O(source)) and merges them into the aggregate table
   with a key-wise full-outer join, dropping groups whose count reaches
   zero;
4. publishes the new aggregate state as the next store version and
   records the consumed source version (same crash-safe ordering as
   replicate_table: data first, then state — a replayed delta would be
   wrong for IVM, so state here is committed in the same lock window
   right after the publish).

This is the TimescaleDB continuous-aggregate / materialized-view-
maintenance role; the reference's analog is re-running the whole
aggregation job per refresh (src/EcomProvider.cs:937-966).  The batch
rollup cascade (operators/temporal.py) recomputes from raw; this
maintains from deltas — at 100 TB the difference between touching the
changed rows and touching everything.

NULL semantics: sums treat NULL as 0 (the view's SUM column is
``SUM(COALESCE(col, 0))``); an all-null group therefore reads 0 where a
direct ``SUM`` would read NULL — document-level choice pinned in tests
and mirrored in every oracle.
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataintegration_ecomprovider_spark.plans import publish

COUNT_COL = "cnt"


def _sum_alias(c: str) -> str:
    return f"sum_{c}"


def _min_alias(c: str) -> str:
    return f"min_{c}"


def _max_alias(c: str) -> str:
    return f"max_{c}"


def _hll_alias(c: str) -> str:
    return f"hll_{c}"


def estimate_distinct(df: DataFrame, distinct_cols: Sequence[str]) -> DataFrame:
    """Replace each maintained HLL sketch column with its BIGINT distinct
    estimate (the read-side of distinct_cols maintenance)."""
    out = df
    for c in distinct_cols:
        out = out.withColumn(
            f"approx_distinct_{c}", F.hll_sketch_estimate(F.col(_hll_alias(c)))
        ).drop(_hll_alias(c))
    return out


def aggregate_table(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """The view definition, computed directly (seed / recompute oracle):
    COUNT(*) + SUM(coalesce(c, 0)) + MIN(c)/MAX(c) per group (MIN/MAX
    skip nulls, standard SQL) + an HLL sketch per distinct_cols column
    (Datasketches hll_sketch_agg; read estimates via
    estimate_distinct)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(COUNT_COL),
        *[
            F.sum(F.coalesce(F.col(c), F.lit(0))).alias(_sum_alias(c))
            for c in sum_cols
        ],
        *[F.min(F.col(c)).alias(_min_alias(c)) for c in min_cols],
        *[F.max(F.col(c)).alias(_max_alias(c)) for c in max_cols],
        *[
            F.hll_sketch_agg(F.col(c)).alias(_hll_alias(c))
            for c in distinct_cols
        ],
    )


def apply_aggregate_delta(
    agg: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    change_col: str = "change_type",
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    source: DataFrame | None = None,
    distinct_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge a read_changes(include_old=True) feed into an aggregate-table
    state: O(delta) contributions + one key-wise merge join.  Groups whose
    count reaches zero drop out (their sums are exactly retracted).

    MIN/MAX (`min_cols`/`max_cols`, `source` = the view's source at the
    TARGET version, required when either is set) are not retractable from
    the delta alone: inserts fold in cheaply (least/greatest against the
    stored extremum), but a RETRACTED value at or beyond the stored
    extremum forces that group's extremum to be recomputed — done with a
    semi-join of the source to ONLY the affected groups, so the recompute
    cost is O(rows of groups that lost an extremum), not O(source).  This
    is the textbook IVM treatment of non-self-maintainable aggregates.

    `distinct_cols` maintain per-group HLL sketches (approx distinct):
    inserts UNION into the stored sketch (sketch merge is cheap and
    order-independent); sketches admit no retraction at all, so ANY
    retraction touching a group forces that group's sketch recompute via
    the same scoped semi-join — the sketch analog of the MIN/MAX rule,
    with a coarser trigger (no "did it touch the extremum" test
    exists for a sketch)."""
    group_cols = list(group_cols)
    sum_cols = list(sum_cols)
    min_cols = list(min_cols)
    max_cols = list(max_cols)
    distinct_cols = list(distinct_cols)
    if (min_cols or max_cols or distinct_cols) and source is None:
        raise ValueError(
            "min/max/distinct maintenance needs the target-version source"
        )

    # +new contributions (insert + update), grouped by NEW group values
    pos = changes.filter(F.col(change_col) != "delete").select(
        *group_cols,
        F.lit(1).alias("__d_cnt"),
        *[F.coalesce(F.col(c), F.lit(0)).alias(f"__d_{c}") for c in sum_cols],
    )
    # -old contributions (delete + update), grouped by OLD group values
    # (delete rows carry old values in BOTH the main and __old columns)
    neg = changes.filter(F.col(change_col) != "insert").select(
        *[F.col(f"{g}__old").alias(g) for g in group_cols],
        F.lit(-1).alias("__d_cnt"),
        *[
            (-F.coalesce(F.col(f"{c}__old"), F.lit(0))).alias(f"__d_{c}")
            for c in sum_cols
        ],
    )
    delta = (
        pos.unionByName(neg)
        .groupBy(*group_cols)
        .agg(
            F.sum("__d_cnt").alias("__d_cnt"),
            *[F.sum(f"__d_{c}").alias(f"__d_{c}") for c in sum_cols],
        )
    )
    # All merge joins key on `__gk` = struct(<group cols>): struct join
    # equality is NULL-SAFE per field (verified: a NULL group value merges
    # instead of splitting into two rows), where joining on the raw group
    # columns would never match NULL groups across the full-outer join.
    def _gk(df: DataFrame) -> DataFrame:
        return df.withColumn("__gk", F.struct(*group_cols)).drop(*group_cols)

    delta = _gk(delta)
    non_self = bool(min_cols or max_cols or distinct_cols)
    if non_self:
        # non-self-maintainable bookkeeping: inserted values fold in
        # cheaply (least/greatest for extrema, sketch-union for HLL);
        # retracted values flag a per-group recompute — for extrema only
        # when they touch the stored extremum, for sketches on ANY
        # retraction of a non-null value
        ins_mm = _gk(
            changes.filter(F.col(change_col) != "delete").groupBy(
                *group_cols
            ).agg(
                *[F.min(F.col(c)).alias(f"__p_min_{c}") for c in min_cols],
                *[F.max(F.col(c)).alias(f"__p_max_{c}") for c in max_cols],
                *[
                    F.hll_sketch_agg(F.col(c)).alias(f"__p_hll_{c}")
                    for c in distinct_cols
                ],
            )
        )
        ret_src_cols = set(min_cols) | set(max_cols) | set(distinct_cols)
        ret_mm = _gk(
            changes.filter(F.col(change_col) != "insert").select(
                *[F.col(f"{g}__old").alias(g) for g in group_cols],
                *[F.col(f"{c}__old").alias(f"__rv_{c}") for c in ret_src_cols],
            ).groupBy(*group_cols).agg(
                *[F.min(f"__rv_{c}").alias(f"__r_min_{c}") for c in min_cols],
                *[F.max(f"__rv_{c}").alias(f"__r_max_{c}") for c in max_cols],
                *[
                    F.max(F.col(f"__rv_{c}").isNotNull()).alias(f"__r_hll_{c}")
                    for c in distinct_cols
                ],
            )
        )
        delta = delta.join(ins_mm, "__gk", "left").join(ret_mm, "__gk", "left")

    merged = _gk(agg).join(delta, "__gk", "full_outer")
    out_cols = [
        *[F.col(f"__gk.{g}").alias(g) for g in group_cols],
        (F.coalesce(F.col(COUNT_COL), F.lit(0))
         + F.coalesce(F.col("__d_cnt"), F.lit(0))).alias(COUNT_COL),
        *[
            (F.coalesce(F.col(_sum_alias(c)), F.lit(0))
             + F.coalesce(F.col(f"__d_{c}"), F.lit(0))).alias(_sum_alias(c))
            for c in sum_cols
        ],
    ]
    if not non_self:
        return merged.select(*out_cols).filter(F.col(COUNT_COL) > 0)

    def _needs_min(c):
        return F.col(f"__r_min_{c}").isNotNull() & (
            F.col(_min_alias(c)).isNull()
            | (F.col(f"__r_min_{c}") <= F.col(_min_alias(c)))
        )

    def _needs_max(c):
        return F.col(f"__r_max_{c}").isNotNull() & (
            F.col(_max_alias(c)).isNull()
            | (F.col(f"__r_max_{c}") >= F.col(_max_alias(c)))
        )

    def _needs_hll(c):
        return F.coalesce(F.col(f"__r_hll_{c}"), F.lit(False))

    needs_any = F.lit(False)
    for c in min_cols:
        needs_any = needs_any | _needs_min(c)
    for c in max_cols:
        needs_any = needs_any | _needs_max(c)
    for c in distinct_cols:
        needs_any = needs_any | _needs_hll(c)
    affected = merged.filter(needs_any).select("__gk").distinct()
    recomputed = (
        source.withColumn("__gk", F.struct(*group_cols))
        .join(affected, "__gk", "left_semi")
        .groupBy("__gk")
        .agg(
            *[F.min(F.col(c)).alias(f"__rc_min_{c}") for c in min_cols],
            *[F.max(F.col(c)).alias(f"__rc_max_{c}") for c in max_cols],
            *[
                F.hll_sketch_agg(F.col(c)).alias(f"__rc_hll_{c}")
                for c in distinct_cols
            ],
        )
    )

    def _hll_merged(c):
        stored, part = F.col(_hll_alias(c)), F.col(f"__p_hll_{c}")
        return (
            F.when(stored.isNull(), part)
            .when(part.isNull(), stored)
            .otherwise(F.hll_union(stored, part))
        )

    out_cols += [
        F.when(_needs_min(c), F.col(f"__rc_min_{c}"))
        .otherwise(F.least(F.col(_min_alias(c)), F.col(f"__p_min_{c}")))
        .alias(_min_alias(c))
        for c in min_cols
    ] + [
        F.when(_needs_max(c), F.col(f"__rc_max_{c}"))
        .otherwise(F.greatest(F.col(_max_alias(c)), F.col(f"__p_max_{c}")))
        .alias(_max_alias(c))
        for c in max_cols
    ] + [
        F.when(_needs_hll(c), F.col(f"__rc_hll_{c}"))
        .otherwise(_hll_merged(c))
        .alias(_hll_alias(c))
        for c in distinct_cols
    ]
    return (
        merged.join(recomputed, "__gk", "left")
        .select(*out_cols)
        .filter(F.col(COUNT_COL) > 0)
    )


def maintain_aggregate(
    spark: SparkSession,
    root: str,
    src: str,
    dst: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    keys: Sequence[str] | None = None,
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    distinct_cols: Sequence[str] = (),
) -> dict:
    """Bring the aggregate table `dst` current with source table `src`
    (same store root): first call seeds with a full aggregation; later
    calls consume only the CDC delta since the version last reflected
    (recorded in the store's sync-state file under ``agg:<dst>``).

    Returns {"dst", "from_version", "to_version", "mode"} — mode is
    "seed" | "delta" | "noop"."""
    state_key = f"agg:{dst}"
    manifest = publish.current_manifest(root)
    src_version = manifest["version"]
    state = publish._sync_state(root)
    last = state.get(state_key)
    if keys is None:
        keys = publish.table_keys(root, src)

    def _seed() -> str:
        out = aggregate_table(
            publish.read_table(spark, root, src), group_cols, sum_cols,
            min_cols=min_cols, max_cols=max_cols, distinct_cols=distinct_cols,
        )
        publish.publish_tables(spark, {dst: out}, root)
        return "seed"

    if last is None or dst not in manifest["tables"]:
        mode = _seed()
    elif last == src_version:
        return {"dst": dst, "from_version": last, "to_version": src_version,
                "mode": "noop"}
    else:
        if not keys:
            raise ValueError(
                f"incremental maintenance of {dst!r} needs {src!r}'s key "
                "columns — publish with table_keys= or pass keys="
            )
        try:
            changes = publish.read_changes(
                spark, root, src, from_version=last, to_version=src_version,
                keys=keys, include_old=True,
            )
        except KeyError:
            # the consumed-from version was vacuumed out of history: the
            # delta is unrecoverable, fall back to a full re-seed
            mode = _seed()
        else:
            if changes.limit(1).count() == 0:
                # the store advanced but `src` didn't (e.g. our own dst
                # publishes): advance the watermark without rewriting
                mode = "empty"
            else:
                agg = publish.read_table(spark, root, dst)
                new_state = apply_aggregate_delta(
                    agg, changes, group_cols, sum_cols,
                    min_cols=min_cols, max_cols=max_cols,
                    distinct_cols=distinct_cols,
                    source=(
                        publish.read_table_at(spark, root, src, src_version)
                        if (min_cols or max_cols or distinct_cols) else None
                    ),
                )
                publish.publish_tables(spark, {dst: new_state}, root)
                mode = "delta"

    with publish._manifest_lock(root):
        state = publish._sync_state(root)
        state[state_key] = src_version
        tmp = os.path.join(root, publish.SYNC_FILE + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(state, fh)
        os.replace(tmp, os.path.join(root, publish.SYNC_FILE))
    return {"dst": dst, "from_version": last, "to_version": src_version,
            "mode": mode}
