"""Skew-resistant aggregation — salted two-phase variants (SURVEY §7 phase 4).

Spark's built-in hash aggregates already do map-side partial aggregation,
so plain count/sum/min/max need no salting.  The operators that DO
concentrate a hot key on one reducer are the collect-based ones this engine
leans on (the A1 string-aggs: one product in millions of relation rows) and
per-group top-1 (A8).  For those, salting splits the hot key across
`salts` reducers in phase 1 and merges the small per-salt results in
phase 2 — the phase-2 input is |keys|·salts rows regardless of skew.

AQE's skew-join splitting handles the JOIN side of a hot key; these helpers
handle the AGGREGATION side, which AQE does not rebalance.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sorted_collect(
    child: DataFrame,
    group_keys: Sequence[str],
    value: Column,
    order_by: Sequence[Column],
    out_name: str,
    salts: int = 16,
) -> DataFrame:
    """Two-phase order-preserving collect: phase 1 collects (order, value)
    structs per (keys, salt) — the hot key spreads over `salts` reducers;
    phase 2 flattens the per-salt arrays and applies ONE global sort_array.
    Result is identical to the unsalted collect_ordered (the final sort is
    total, so per-salt arrival order is irrelevant)."""
    struct = F.struct(*order_by, value.alias("__v"))
    # deterministic salt from the order keys (not rand()): identical across
    # retries, and it spreads a hot group because order keys vary per row
    salted = child.withColumn("__salt", F.pmod(F.xxhash64(*order_by), F.lit(salts)))
    phase1 = salted.groupBy(*group_keys, "__salt").agg(
        F.collect_list(struct).alias("__part")
    )
    phase2 = phase1.groupBy(*group_keys).agg(
        F.sort_array(F.flatten(F.collect_list("__part"))).alias("__arr")
    )
    return phase2.select(
        *group_keys, F.transform("__arr", lambda s: s["__v"]).alias(out_name)
    )


def salted_top1(
    df: DataFrame,
    group_keys: Sequence[str],
    rank_struct: Column,
    salts: int = 16,
) -> DataFrame:
    """Two-phase min-by: phase 1 takes the per-(keys, salt) minimum of
    `rank_struct` (struct-ordered — put the ordering columns first and the
    payload last); phase 2 reduces the `salts` candidates per key.  Replaces
    a row_number window whose hot partition would serialize on one task."""
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(rank_struct), F.lit(salts)))
    phase1 = salted.groupBy(*group_keys, "__salt").agg(F.min(rank_struct).alias("__cand"))
    return phase1.groupBy(*group_keys).agg(F.min("__cand").alias("top"))
