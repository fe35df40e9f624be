"""Stream-stream interval joins with watermark-bounded state (SURVEY
§2.10 extension).

Net-new relative to the reference (whose joins all run at import time,
src/EcomSourceReader.cs:151-226): two live event streams joined on a key
within an event-time interval — the attribution shape (purchase within N
minutes of a click, error following a deploy, …).

Scale: Spark buffers each side's rows as state until the other side's
watermark passes the interval bound, then expires them — so state size is
O(rate × interval), not O(stream).  Without BOTH watermarks and a
time-range predicate on the join condition, a stream-stream join is
rejected (inner) or unbounded; this module builds the condition in the
exact shape Structured Streaming's state-cleanup analyzer recognizes.
The same expression tree runs in batch (no watermarks) — that form is the
oracle-checked query surface (plans/stream_queries.q_interval_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str,
    lower: str | None = None,
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join `right` rows to `left` rows with the same `key` where
    ``left_ts + lower <= right_ts <= left_ts + upper`` (SQL interval
    strings, e.g. ``'30 minutes'``; `lower` defaults to ``'0 seconds'`` —
    strictly-after attribution.  A negative `lower` like ``'-5 minutes'``
    admits right events shortly BEFORE the left event, the
    clock-skew-tolerant form).

    For streaming inputs pass BOTH watermarks: left-side state can expire
    once the right watermark passes `left_ts + upper`, right-side state
    once the left watermark passes `right_ts` — the bounded-state
    contract.  Leave them None for the batch/oracle form.

    Column collisions: every non-key column of `left` keeps its name;
    colliding columns of `right` get a ``r_`` prefix.  The key joins with
    an equi-condition so the shuffle hashes on it (both sides partition
    identically — one Exchange each, no broadcast needed at stream scale).
    """
    if left_watermark is not None:
        left = left.withWatermark(left_ts, left_watermark)
    if right_watermark is not None:
        right = right.withWatermark(right_ts, right_watermark)

    collisions = (set(left.columns) & set(right.columns)) - {key}
    for c in collisions:
        right = right.withColumnRenamed(c, f"r_{c}")
    r_ts = f"r_{right_ts}" if right_ts in collisions else right_ts

    # alias both sides and qualify every reference: when left and right
    # share lineage (the batch/oracle form joins two projections of one
    # table) unqualified/dataset-indexed refs resolve to the same attribute
    # and Spark falls back to self-join disambiguation with a
    # "trivially true equals predicate" warning — aliases make the
    # resolution explicit instead
    left = left.alias("__ij_l")
    right = right.alias("__ij_r")
    l_ts, l_key = F.col(f"__ij_l.{left_ts}"), F.col(f"__ij_l.{key}")
    rr_ts, r_key = F.col(f"__ij_r.{r_ts}"), F.col(f"__ij_r.{key}")
    lo = (
        l_ts
        if lower is None
        # Spark parses signed interval literals: INTERVAL -5 MINUTES
        else l_ts + F.expr(f"INTERVAL {lower}")
    )
    cond = (
        (l_key == r_key)
        & (rr_ts >= lo)
        & (rr_ts <= l_ts + F.expr(f"INTERVAL {upper}"))
    )
    joined = left.join(right, cond, how)
    # keep ONE key column (join condition used qualified refs)
    return joined.drop(r_key)
